"""AOT export + standalone serving of trained decode programs.

The reference deploys by re-running the training script's graph-build and
restoring a Saver checkpoint — serving requires the full model code and an
exact config replica (upstream:avsr.py Session+Saver workflow, SURVEY.md
§2.2 row 1).  The TPU-native equivalent is ahead-of-time export: the fused
frontend→encoder→beam-decode program is lowered ONCE to a serialized,
version-stable StableHLO artifact (``jax.export``) with the trained
parameters stored alongside.  A serving host then needs jax + this module's
~100-line loader — no model code, no config, no checkpoint machinery — and
can target CPU or TPU from the same artifact (multi-platform lowering).

Artifact layout (one directory):
  decode.jaxexport  serialized Exported: decode(params_leaves, *inputs)
  params.npz        trained parameter leaves, in pytree-flatten order
  meta.json         input names/shapes/dtypes, unit inventory, id semantics

Design notes:
- The exported callable takes the parameter pytree as a flat LIST of
  arrays, so deserialization needs no custom pytree registrations; the
  leaf order is jax.tree_util.tree_flatten's, frozen into params.npz.
- Shapes are static (the bucketed-serving model that the whole framework
  uses — SURVEY §7.3 hard-part 1); the Predictor pads requests up to the
  exported (B, S) and rejects overruns loudly.  Export one artifact per
  serving bucket if multiple shapes are needed.
- PAD/GO/EOS semantics are recorded in meta.json, so the id→text decode at
  serving time is self-describing (avsr_tpu/data/units.py:11).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

PROGRAM_FILE = "decode.jaxexport"
PARAMS_FILE = "params.npz"
META_FILE = "meta.json"

PAD_ID, GO_ID, EOS_ID = 0, 1, 2


def _input_signature(cfg, batch_size: int, audio_seconds: float,
                     video_seconds: Optional[float],
                     transfer: str = "float32") -> List[Tuple[str, tuple, str]]:
    """(name, shape, dtype) for each array the architecture consumes.

    ``transfer="compact"`` mirrors the training loader's
    ``data.transfer_dtype``: int16 PCM audio and uint8 ROI video on the
    wire, dequantized ON DEVICE inside the exported program
    (models/seq2seq.py encode handles both dtypes) — 2x/4x fewer
    host→device bytes per request, which dominates real serving latency
    (RESULTS.md round-3 serving measurements).  AU-feature video stays
    float32 (intensities are not [0, 1]-bounded).
    """
    import math

    if video_seconds is None:
        video_seconds = audio_seconds
    compact = transfer == "compact"
    sig: List[Tuple[str, tuple, str]] = []
    arch = cfg.architecture
    if arch in ("audio", "av_align", "bimodal"):
        S = int(round(audio_seconds * cfg.audio.sample_rate))
        sig.append(("audio", (batch_size, S),
                    "int16" if compact else "float32"))
        sig.append(("audio_lengths", (batch_size,), "int32"))
    if arch in ("video", "av_align", "bimodal"):
        T_v = int(math.ceil(video_seconds * cfg.data.video_fps))
        v = cfg.video
        if v.use_au_features:
            shape = (batch_size, T_v, v.au_dim)
            vdt = "float32"
        else:
            shape = (batch_size, T_v, v.roi_height, v.roi_width, v.channels)
            vdt = "uint8" if compact else "float32"
        sig.append(("video", shape, vdt))
        sig.append(("video_lengths", (batch_size,), "int32"))
    return sig


def export_decode(
    state_params,
    cfg,
    *,
    use_beam: bool = True,
    batch_size: int = 8,
    audio_seconds: float = 6.0,
    video_seconds: Optional[float] = None,
    platforms: Optional[Sequence[str]] = None,
    mesh=None,
    transfer: str = "float32",
    n_best: int = 1,
):
    """Lower the full decode program to a serializable Exported.

    ``n_best > 1`` (beam only) exports a program returning
    ``(ids [B, N, L], scores [B, N])`` ranked best-first instead of the
    top-1 ``ids [B, L]``.

    Returns (exported, params_leaves, input_signature).  ``platforms``
    defaults to the current backend; pass ("cpu", "tpu") for a single
    artifact deployable on either.

    ``mesh`` (a jax.sharding.Mesh with a leading data axis) exports a
    DATA-PARALLEL program: params replicated, the request batch sharded
    over the axis, one exported artifact serving the whole slice.  The
    serving host must expose exactly mesh.size devices (Predictor
    rebuilds the mesh at load).
    """
    import jax
    from jax import export as jax_export

    from avsr_tpu.decode.beam import beam_search
    from avsr_tpu.decode.greedy import greedy_decode
    from avsr_tpu.models import seq2seq

    if n_best > cfg.decode.beam_width:
        raise ValueError(
            f"n_best {n_best} exceeds decode.beam_width "
            f"{cfg.decode.beam_width}: the beam cannot rank more leaves "
            f"than it keeps"
        )
    sig = _input_signature(cfg, batch_size, audio_seconds, video_seconds,
                           transfer)
    names = [n for n, _, _ in sig]
    leaves, treedef = jax.tree_util.tree_flatten(state_params)

    def decode(param_leaves, *arrays):
        params = jax.tree_util.tree_unflatten(treedef, param_leaves)
        fields = dict(zip(names, arrays))
        batch = seq2seq.Batch(**fields)
        out = seq2seq.encode(params, cfg, batch, train=False)
        if use_beam and cfg.decode.beam_width > 1:
            res = beam_search(
                params["decoder"], cfg.decoder, out.memories,
                cfg.decode.max_decode_length,
                beam_width=cfg.decode.beam_width,
                length_penalty=cfg.decode.length_penalty,
                compute_dtype=seq2seq.compute_dtype_of(cfg),
                n_best=n_best,
            )
            if n_best > 1:
                return res.nbest_ids, res.nbest_scores
            return res.ids
        if n_best > 1:
            raise ValueError("n_best > 1 requires beam decoding "
                             "(use_beam=True, decode.beam_width > 1)")
        ids, _ = greedy_decode(
            params["decoder"], cfg.decoder, out.memories,
            cfg.decode.max_decode_length,
            compute_dtype=seq2seq.compute_dtype_of(cfg),
        )
        return ids

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(mesh, PartitionSpec())
        shard = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
        if batch_size % mesh.shape[mesh.axis_names[0]] != 0:
            raise ValueError(
                f"batch_size {batch_size} must divide the mesh "
                f"{mesh.axis_names[0]} axis "
                f"({mesh.shape[mesh.axis_names[0]]})"
            )
        jitted = jax.jit(decode,
                         in_shardings=(rep,) + (shard,) * len(sig),
                         out_shardings=rep)
        leaf_specs = [jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=rep)
                      for l in leaves]
        input_specs = [
            jax.ShapeDtypeStruct(shape, np.dtype(dt), sharding=shard)
            for _, shape, dt in sig
        ]
    else:
        jitted = jax.jit(decode)
        leaf_specs = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves]
        input_specs = [
            jax.ShapeDtypeStruct(shape, np.dtype(dt)) for _, shape, dt in sig
        ]
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jax_export.export(jitted, **kwargs)(leaf_specs, *input_specs)
    return exported, [np.asarray(l) for l in leaves], sig


def save_artifact(out_dir: str, exported, params_leaves, sig, unit_dict,
                  *, extra_meta: Optional[Dict] = None) -> str:
    """Write the serving artifact directory; returns out_dir."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, PROGRAM_FILE), "wb") as f:
        f.write(exported.serialize())
    np.savez(
        os.path.join(out_dir, PARAMS_FILE),
        **{f"leaf_{i:05d}": l for i, l in enumerate(params_leaves)},
    )
    meta = {
        "inputs": [
            {"name": n, "shape": list(s), "dtype": d} for n, s, d in sig
        ],
        # Inventory WITHOUT the 3 specials (ids 3..): mirrors UnitDict.save.
        "units": list(unit_dict.idx_to_unit[3:]),
        "unit_type": unit_dict.unit_type,
        "pad_id": PAD_ID, "go_id": GO_ID, "eos_id": EOS_ID,
        "platforms": list(exported.platforms),
        "num_devices": int(exported.nr_devices),
        # Ops breadcrumbs: jax.export guarantees compatibility windows by
        # calling-convention version; record what produced the artifact.
        "jax_version": __import__("jax").__version__,
        "calling_convention": int(exported.calling_convention_version),
    }
    if extra_meta:
        meta.update(extra_meta)
    with open(os.path.join(out_dir, META_FILE), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


class Predictor:
    """Run an exported decode artifact; needs NO model code or config.

    >>> p = Predictor.load("artifacts/av_6s_b8")
    >>> p.transcribe(audio=[wav1, wav2])
    ['hello world', 'ok']
    """

    def __init__(self, exported, params_leaves: List[np.ndarray], meta: Dict):
        self._exported = exported
        self._leaves = params_leaves
        self.meta = meta
        self._inputs = {i["name"]: i for i in meta["inputs"]}
        self._units = meta["units"]
        self._shardings = None  # (replicated, batch) for DP artifacts

    @classmethod
    def load(cls, path: str) -> "Predictor":
        from jax import export as jax_export

        with open(os.path.join(path, PROGRAM_FILE), "rb") as f:
            exported = jax_export.deserialize(bytearray(f.read()))
        with np.load(os.path.join(path, PARAMS_FILE)) as z:
            leaves = [z[k] for k in sorted(z.files)]
        with open(os.path.join(path, META_FILE)) as f:
            meta = json.load(f)
        return cls(exported, leaves, meta)

    @property
    def batch_size(self) -> int:
        return int(self.meta["inputs"][0]["shape"][0])

    def _pad_batch(self, name: str, seqs: Sequence[np.ndarray]):
        spec = self._inputs[name]
        shape, dtype = tuple(spec["shape"]), spec["dtype"]
        B, S = shape[0], shape[1]
        if len(seqs) > B:
            raise ValueError(
                f"{len(seqs)} {name} inputs exceed the exported batch size "
                f"{B}; export a larger bucket or split the request"
            )
        out = np.zeros(shape, dtype)
        lengths = np.zeros((B,), np.int32)
        for i, s in enumerate(seqs):
            s = np.asarray(s)
            out[i, : s.shape[0]] = self._check_and_quantize(
                name, i, s, shape, dtype
            )
            lengths[i] = s.shape[0]
        return out, lengths

    def _check_and_quantize(self, name, i, s, shape, dtype):
        """Everything _pad_batch rejects for ONE utterance (horizon,
        trailing shape, quantize range)."""
        if s.shape[0] > shape[1]:
            raise ValueError(
                f"{name} input {i} has {s.shape[0]} steps; exported "
                f"horizon is {shape[1]} — export a longer bucket"
            )
        if s.shape[1:] != shape[2:]:
            raise ValueError(
                f"{name} input {i} trailing shape {s.shape[1:]} != "
                f"exported {shape[2:]}"
            )
        return self._quantize(name, s, dtype)

    def validate_utterance(self, audio=None, video=None) -> None:
        """Raise the error _pad_batch would raise for this single
        utterance (horizon, trailing shape, quantize range).  Serving
        hosts call this at SUBMIT time so one client's bad input fails
        its own request instead of poisoning a coalesced batch."""
        for name, s in (("audio", audio), ("video", video)):
            if s is None or name not in self._inputs:
                continue
            spec = self._inputs[name]
            s = np.asarray(s)
            self._check_and_quantize(
                name, 0, s, tuple(spec["shape"]), spec["dtype"]
            )

    @staticmethod
    def _quantize(name: str, s: np.ndarray, dtype: str) -> np.ndarray:
        """Float request -> the exported wire dtype (compact artifacts
        quantize on the host, dequantize on device; loader semantics)."""
        if dtype == "int16":
            if np.issubdtype(s.dtype, np.integer):
                return s.astype(np.int16)
            lo = float(s.min()) if s.size else 0.0
            hi = float(s.max()) if s.size else 0.0
            # Same bound as the training loader's compact transfer
            # (data/loader.py): full-scale 16-bit PCM spans
            # [-32768/32767, 1] after load_wav's /32767, so a clipped
            # recording's most-negative sample is a VALID request.
            if lo < -32768.0 / 32767.0 - 1e-6 or hi > 1.0 + 1e-6:
                raise ValueError(
                    f"{name} request range [{lo:.4f}, {hi:.4f}]; compact "
                    "artifacts expect int16-PCM-range waveforms in "
                    "[-32768/32767, 1]"
                )
            return (
                np.clip(np.round(s * 32767.0), -32768, 32767)
                .astype(np.int16)
            )
        if dtype == "uint8":
            if s.dtype == np.uint8:
                return s
            lo, hi = (float(s.min()), float(s.max())) if s.size else (0.0, 0.0)
            if lo < -1e-6 or hi > 1.0 + 1e-6:
                raise ValueError(
                    f"{name} request range [{lo:.3f}, {hi:.3f}]; compact "
                    "artifacts expect ROI pixels in [0, 1]"
                )
            return np.round(s * 255.0).astype(np.uint8)
        return s.astype(dtype)

    def decode_ids(self, ids: np.ndarray) -> str:
        toks = []
        for i in ids:
            i = int(i)
            if i == EOS_ID:
                break
            if i in (PAD_ID, GO_ID) or not 0 <= i - 3 < len(self._units):
                continue
            toks.append(self._units[i - 3])
        sep = ("" if self.meta.get("unit_type", "character")
               .startswith("character") else " ")
        return sep.join(toks)

    def _dp_place(self):
        """Data-parallel artifact: rebuild the mesh and place the params
        replicated / requests batch-sharded (one-time; leaves cached on
        device)."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        n = int(self.meta.get("num_devices", 1))
        devs = jax.devices()
        if len(devs) < n:
            raise RuntimeError(
                f"artifact was exported for {n} devices; this host exposes "
                f"{len(devs)}"
            )
        mesh = Mesh(np.asarray(devs[:n]).reshape(n), ("data",))
        rep = NamedSharding(mesh, PartitionSpec())
        shard = NamedSharding(mesh, PartitionSpec("data"))
        self._leaves = [jax.device_put(l, rep) for l in self._leaves]
        self._shardings = (rep, shard)

    def _place_params(self):
        """One-time: pin the param leaves on device.  Leaving them as host
        numpy would re-transfer the full parameter set on EVERY request
        (measured: ~35 MB over the axon relay dominates warm latency on
        the flagship artifact); requests should only pay for their own
        input bytes."""
        import jax

        if int(self.meta.get("num_devices", 1)) > 1:
            self._dp_place()
        else:
            self._leaves = [jax.device_put(l) for l in self._leaves]
            self._shardings = ()

    def __call__(self, **arrays):
        """Raw call: padded full-shape arrays in, hypothesis ids out (or
        ``(nbest_ids, nbest_scores)`` for an n-best artifact)."""
        args = [arrays[i["name"]] for i in self.meta["inputs"]]
        if self._shardings is None:
            self._place_params()
        if self._shardings:
            import jax

            args = [jax.device_put(a, self._shardings[1]) for a in args]
        out = self._exported.call(self._leaves, *args)
        if isinstance(out, (tuple, list)):
            return tuple(np.asarray(o) for o in out)
        return np.asarray(out)

    def _assemble(self, audio, video):
        """Validated request assembly shared by transcribe/transcribe_nbest:
        pads each required modality, rejects missing modalities and
        mismatched utterance counts.  Returns (arrays, n)."""
        n = None
        arrays: Dict[str, np.ndarray] = {}
        for name, seqs in (("audio", audio), ("video", video)):
            if name in self._inputs:
                if seqs is None:
                    raise ValueError(f"exported program requires {name=}")
                padded, lengths = self._pad_batch(name, seqs)
                arrays[name] = padded
                arrays[f"{name}_lengths"] = lengths
                if n is None:
                    n = len(seqs)
                elif len(seqs) != n:
                    raise ValueError("audio/video request counts differ")
        if not n:
            raise ValueError("empty request: no utterances")
        return arrays, n

    def transcribe(
        self,
        *,
        audio: Optional[Sequence[np.ndarray]] = None,
        video: Optional[Sequence[np.ndarray]] = None,
    ) -> List[str]:
        """Variable-length utterances in, transcripts out (pads + decodes)."""
        arrays, n = self._assemble(audio, video)
        out = self(**arrays)
        if isinstance(out, tuple):  # n-best artifact: rank 0 is the winner
            ids = out[0][:, 0]
        else:
            ids = out
        return [self.decode_ids(ids[i]) for i in range(n)]

    @property
    def n_best(self) -> int:
        return int(self.meta.get("n_best", 1))

    def transcribe_nbest(
        self,
        *,
        audio: Optional[Sequence[np.ndarray]] = None,
        video: Optional[Sequence[np.ndarray]] = None,
    ) -> "List[List[Tuple[str, float]]]":
        """Per utterance: ranked [(hypothesis, score), ...] alternatives.
        Requires an artifact exported with ``n_best > 1``."""
        if self.n_best <= 1:
            raise ValueError(
                "artifact was exported top-1 only; re-export with "
                "--n-best N for ranked alternatives"
            )
        arrays, n = self._assemble(audio, video)
        ids, scores = self(**arrays)
        return [
            [(self.decode_ids(ids[i, r]), float(scores[i, r]))
             for r in range(ids.shape[1])]
            for i in range(n)
        ]


class BucketedPredictor:
    """Routes each request to the smallest exported bucket that fits it.

    Static shapes are the TPU serving model (SURVEY §7.3 hard-part 1 — the
    same bucketing the training loader does): a 2 s utterance must not pay
    a 10 s program.  Exposes the same transcribe() surface as Predictor.
    """

    def __init__(self, buckets: List[Predictor]):
        if not buckets:
            raise ValueError("no buckets")
        # ascending by audio horizon
        self.buckets = sorted(
            buckets, key=lambda p: p._inputs[p.meta["inputs"][0]["name"]]
            ["shape"][1]
        )
        self.meta = self.buckets[-1].meta

    def _pick(self, audio, video) -> Predictor:
        # Empty requests fall through to the single-bucket Predictor's
        # clean "empty request" error instead of a bare max() ValueError.
        if not audio and not video:
            return self.buckets[0]
        for p in self.buckets:
            ok = True
            if audio and "audio" in p._inputs:
                S = p._inputs["audio"]["shape"][1]
                ok = ok and max(len(a) for a in audio) <= S
            if video and "video" in p._inputs:
                T = p._inputs["video"]["shape"][1]
                ok = ok and max(len(v) for v in video) <= T
            if ok:
                return p
        return self.buckets[-1]  # overruns raise there, with the message

    def validate_utterance(self, audio=None, video=None) -> None:
        # The LARGEST bucket owns per-utterance validation: its horizon is
        # the artifact's true limit (matching _pick's overrun fallback).
        self.buckets[-1].validate_utterance(audio=audio, video=video)

    def transcribe(self, *, audio=None, video=None) -> List[str]:
        return self._pick(audio, video).transcribe(audio=audio, video=video)

    @property
    def n_best(self) -> int:
        return min(p.n_best for p in self.buckets)

    def transcribe_nbest(self, *, audio=None, video=None):
        return self._pick(audio, video).transcribe_nbest(
            audio=audio, video=video
        )


def load_predictor(path: str):
    """Load a serving artifact directory: single bucket or bucketed set."""
    manifest = os.path.join(path, META_FILE)
    with open(manifest) as f:
        meta = json.load(f)
    if "buckets" in meta:
        return BucketedPredictor(
            [Predictor.load(os.path.join(path, b["path"]))
             for b in meta["buckets"]]
        )
    return Predictor.load(path)


def export_serving_artifact(
    avsr,
    out_dir: str,
    *,
    use_beam: bool = True,
    batch_size: int = 8,
    audio_seconds: "float | Sequence[float]" = 6.0,
    video_seconds: Optional[float] = None,
    platforms: Optional[Sequence[str]] = ("cpu", "tpu"),
    checkpoint: Optional[int] = None,
    data_parallel: Optional[int] = None,
    transfer: str = "compact",
    n_best: int = 1,
) -> str:
    """AVSR-level one-call export: restore → lower → serialize.

    ``n_best > 1`` (beam only) exports a ranked-alternatives program:
    ``Predictor.transcribe`` still returns the top-1 texts, and
    ``transcribe_nbest`` returns [(hypothesis, score), ...] per utterance.

    Restores like predict() (latest checkpoint unless ``checkpoint`` given
    or training happened this session); refuses never-trained states.
    Artifacts default to multi-platform (cpu+tpu) lowering — measured
    ~0.3% size cost over single-platform, and it removes the deploy
    footgun of an artifact that refuses the serving host's backend.

    ``audio_seconds`` may be a sequence: one bucket program is exported per
    horizon under ``out_dir/bucket_*``, with a root manifest;
    ``load_predictor`` then routes each request to the smallest fitting
    bucket (static-shape TPU serving).

    ``data_parallel=N`` exports a DP program over an N-device mesh (params
    replicated, request batch sharded; batch_size must divide N) — one
    artifact serves the whole slice.  The serving host must expose >= N
    devices; a Predictor loading it rebuilds the mesh automatically.

    ``transfer`` defaults to "compact" (int16 PCM / uint8 ROI on the wire,
    dequantized on device): request host→device bytes drop 2x (audio) /
    4x (video), and measured flagship serving latency is transfer-bound
    (RESULTS.md round-3 serving section).  Use "float32" for bit-identical
    parity with the in-process float path on non-PCM-grid inputs.
    """
    mesh = None
    if data_parallel is not None and data_parallel > 1:
        import jax
        from jax.sharding import Mesh

        devs = jax.devices()
        if len(devs) < data_parallel:
            raise ValueError(
                f"data_parallel={data_parallel} but only {len(devs)} "
                "devices visible at export time"
            )
        # 1-D (data,) mesh, mirrored EXACTLY by Predictor._dp_place at load.
        mesh = Mesh(np.asarray(devs[:data_parallel]).reshape(data_parallel),
                    ("data",))
    trainer = avsr.trainer
    if checkpoint is not None:
        trainer.state, _, step = trainer.ckpt.restore(trainer.state,
                                                      step=checkpoint)
        trainer._host_step = int(step)
    elif trainer._host_step == 0:
        if trainer.ckpt.latest_step() is None:
            raise RuntimeError(
                "export on a never-trained model: no checkpoint under "
                f"{trainer.ckpt.directory} and no training this session"
            )
        trainer.state, _, step = trainer.ckpt.restore(trainer.state)
        trainer._host_step = int(step)

    def one(out, seconds):
        exported, leaves, sig = export_decode(
            trainer.state.params, avsr.config,
            use_beam=use_beam, batch_size=batch_size,
            audio_seconds=seconds, video_seconds=video_seconds,
            platforms=platforms, mesh=mesh, transfer=transfer,
            n_best=n_best,
        )
        return save_artifact(
            out, exported, leaves, sig, avsr.unit_dict,
            extra_meta={
                "architecture": avsr.config.architecture,
                "use_beam": bool(
                    use_beam and avsr.config.decode.beam_width > 1
                ),
                "checkpoint_step": int(trainer._host_step),
                "audio_seconds": seconds,
                "transfer": transfer,
                "n_best": int(n_best),
            },
        )

    # Strings are scalars here, never character iterables: "10" must mean
    # one 10 s bucket (iterating it would silently export 1s/0s buckets).
    if isinstance(audio_seconds, str):
        parts = [p for p in audio_seconds.split(",") if p.strip()]
        horizons = sorted(float(p) for p in parts)
    else:
        try:
            horizons = sorted(float(s) for s in audio_seconds)  # type: ignore
        except TypeError:
            return one(out_dir, float(audio_seconds))
    if len(horizons) == 1:
        return one(out_dir, horizons[0])
    os.makedirs(out_dir, exist_ok=True)
    buckets = []
    for s in horizons:
        sub = f"bucket_{s:g}s"
        one(os.path.join(out_dir, sub), s)
        buckets.append({"audio_seconds": s, "path": sub})
    with open(os.path.join(out_dir, META_FILE), "w") as f:
        json.dump({"buckets": buckets,
                   "architecture": avsr.config.architecture}, f, indent=1)
    return out_dir
