"""Serving-artifact latency/throughput bench.

Loads an exported artifact (avsr_tpu/serve.py; see docs/SERVING.md), fills
its batch with full-horizon random inputs (worst case: no early decode
exit from padding), and reports warm request latency + throughput as one
JSON line.  Runs wherever the artifact was lowered for (cpu and/or tpu).

  python tools/bench_serving.py ARTIFACT_DIR [iters]

TPU timing note (CLAUDE.md): every call already ends in a host fetch
(np.asarray of the ids), so per-call wall time is a true device sync.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def time_requests(pred, kwargs, iters: int):
    """Shared request-timing protocol (also used by tools/bench_serve.py):
    one drained cold call, then sorted warm times.  transcribe returns a
    list of host strings, so every call ends in a true host sync
    (CLAUDE.md TPU timing rule)."""
    t0 = time.time()
    pred.transcribe(**kwargs)
    first = time.time() - t0
    times = []
    for _ in range(iters):
        t0 = time.time()
        pred.transcribe(**kwargs)
        times.append(time.time() - t0)
    times.sort()
    return first, times


def main() -> int:
    path = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    import jax

    from avsr_tpu.serve import BucketedPredictor, load_predictor

    pred = load_predictor(path)
    preds = pred.buckets if isinstance(pred, BucketedPredictor) else [pred]
    rng = np.random.RandomState(0)
    results = []
    for p in preds:
        spec = {i["name"]: i for i in p.meta["inputs"]}
        B = p.batch_size
        kwargs = {}
        if "audio" in spec:
            S = spec["audio"]["shape"][1]
            kwargs["audio"] = [rng.randn(S).astype(np.float32) * 0.05
                               for _ in range(B)]
        if "video" in spec:
            shp = tuple(spec["video"]["shape"][1:])
            kwargs["video"] = [
                np.clip(rng.rand(*shp), 0, 1).astype(np.float32)
                for _ in range(B)
            ]
        first, times = time_requests(p, kwargs, iters)
        p50 = times[len(times) // 2]
        results.append({
            "audio_seconds": p.meta.get("audio_seconds"),
            "batch_size": B,
            "use_beam": p.meta.get("use_beam"),
            "num_devices": p.meta.get("num_devices", 1),
            "first_call_s": round(first, 2),
            "warm_p50_ms": round(p50 * 1e3, 2),
            "warm_min_ms": round(times[0] * 1e3, 2),
            "utterances_per_sec": round(B / p50, 1),
        })
    print(json.dumps({
        "artifact": path,
        "backend": str(jax.devices()[0]),
        "buckets": results,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
