"""Corpus-scale streaming ingest tests (SURVEY.md §2.2 row 10, §2.3 row 5):
lazy record sources, AV inner join, parallel decode workers, bounded RSS."""

import os
import subprocess
import sys

import numpy as np
import pytest

from avsr_tpu.configs import DataConfig
from avsr_tpu.data import tfrecord
from avsr_tpu.data.grain_loader import JoinedAVSource, TFRecordDataSource
from avsr_tpu.data.loader import BucketingLoader
from avsr_tpu.data.synthetic import SyntheticSpec, Utterance, generate
from avsr_tpu.data.units import builtin_unit_dict


@pytest.fixture(scope="module")
def record_file(tmp_path_factory):
    utts = generate(SyntheticSpec(num_utterances=10, seed=5, alphabet="abc"))
    path = str(tmp_path_factory.mktemp("rec") / "d.tfrecord")
    tfrecord.write_dataset(utts, path)
    return path, utts


def test_index_records_matches_payloads(record_file):
    path, utts = record_file
    spans = tfrecord.index_records(path)
    assert len(spans) == len(utts)
    with open(path, "rb") as f:
        for (off, ln), expect in zip(spans, tfrecord.iter_records(path)):
            assert tfrecord.read_record_at(f, off, ln) == expect


def test_streaming_source_lazy_decode(record_file):
    path, utts = record_file
    src = TFRecordDataSource(path)
    assert len(src) == len(utts)
    u = src[3]
    assert u.uid == utts[3].uid
    np.testing.assert_allclose(u.waveform, utts[3].waveform, rtol=1e-6)
    assert src.uids() == [u.uid for u in utts]


def _batches(loader):
    return [
        (b, tuple(batch["uids"]), batch["audio"].sum(), batch["targets"].sum())
        for b, batch in loader.epoch(shuffle=False)
    ]


def test_streaming_loader_equivalent_to_in_memory(record_file):
    path, utts = record_file
    cfg = DataConfig(batch_size=4, audio_bucket_boundaries=(40, 80, 160),
                     max_label_length=8)
    units = builtin_unit_dict("character")
    mk = lambda data, **kw: BucketingLoader(
        data, units, cfg.replace(**kw) if kw else cfg,
        require_audio=True, require_video=False,
        frame_step=160, frame_length=400,
    )
    in_mem = _batches(mk(utts))
    streamed = _batches(mk(TFRecordDataSource(path)))
    assert in_mem == streamed


def test_parallel_workers_equivalent(record_file):
    path, _ = record_file
    units = builtin_unit_dict("character")
    mk = lambda workers: BucketingLoader(
        TFRecordDataSource(path), units,
        DataConfig(batch_size=4, audio_bucket_boundaries=(40, 80, 160),
                   max_label_length=8, num_workers=workers),
        require_audio=True, require_video=False,
        frame_step=160, frame_length=400,
    )
    assert _batches(mk(0)) == _batches(mk(2))


def test_joined_av_source_inner_join(tmp_path):
    full = generate(SyntheticSpec(num_utterances=6, seed=2, alphabet="ab"))
    audio = [Utterance(uid=u.uid, transcript=u.transcript, waveform=u.waveform)
             for u in full[:5]]                       # u0..u4
    video = [Utterance(uid=u.uid, transcript=u.transcript, video=u.video,
                       au=u.au)
             for u in full[2:]]                       # u2..u5
    ap, vp = str(tmp_path / "a.tfrecord"), str(tmp_path / "v.tfrecord")
    tfrecord.write_dataset(audio, ap)
    tfrecord.write_dataset(video, vp)
    src = JoinedAVSource(TFRecordDataSource(ap), TFRecordDataSource(vp))
    assert len(src) == 3                              # u2, u3, u4
    assert src.dropped_audio == 2 and src.dropped_video == 1
    for i in range(len(src)):
        u = src[i]
        assert u.waveform is not None and u.video is not None
        np.testing.assert_allclose(u.video, full[2 + i].video, atol=1e-6)


def test_joined_av_source_no_overlap_raises(tmp_path):
    a = generate(SyntheticSpec(num_utterances=2, seed=1, alphabet="ab"))
    b = generate(SyntheticSpec(num_utterances=2, seed=1, alphabet="ab"))
    for u in b:
        u.uid = "other_" + u.uid
    ap, vp = str(tmp_path / "a.tfrecord"), str(tmp_path / "v.tfrecord")
    tfrecord.write_dataset(a, ap)
    tfrecord.write_dataset(b, vp)
    with pytest.raises(ValueError, match="share no uids"):
        JoinedAVSource(TFRecordDataSource(ap), TFRecordDataSource(vp))


_RSS_SCRIPT = r"""
import sys

def vm_kb(field):
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith(field):
                return int(line.split()[1])
    raise RuntimeError(field)

path = sys.argv[1]
from avsr_tpu.configs import DataConfig
from avsr_tpu.data.grain_loader import TFRecordDataSource
from avsr_tpu.data.loader import BucketingLoader
from avsr_tpu.data.units import builtin_unit_dict

src = TFRecordDataSource(path)
baseline = vm_kb("VmRSS")
loader = BucketingLoader(
    src, builtin_unit_dict("character"),
    DataConfig(batch_size=2, audio_bucket_boundaries=(2000,),
               max_label_length=8),
    require_audio=True, require_video=False,
    frame_step=160, frame_length=400,
)
n = sum(1 for _ in loader.epoch(shuffle=False))
peak = vm_kb("VmHWM")
print(f"{baseline} {peak} {n}")
"""


def test_streaming_rss_bounded(tmp_path):
    """A record file much larger than the working set streams with bounded
    host RSS — the LRS2-scale requirement (VERDICT round-1 item 1)."""
    rng = np.random.default_rng(0)
    n_utts, samples = 48, 240_000  # ~46 MB of float32 waveform payload
    path = str(tmp_path / "big.tfrecord")
    with tfrecord.TFRecordWriter(path) as w:
        for i in range(n_utts):
            u = Utterance(
                uid=f"u{i}", transcript="ab",
                waveform=rng.standard_normal(samples).astype(np.float32),
            )
            w.write(tfrecord.utterance_to_bytes(u))
    file_mb = os.path.getsize(path) / 1e6
    assert file_mb > 40
    # subprocess: clean RSS baseline, no jax import on this path
    out = subprocess.run(
        [sys.executable, "-c", _RSS_SCRIPT, path],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    baseline_kb, peak_kb, n_batches = map(int, out.stdout.split())
    assert n_batches == n_utts // 2
    growth_mb = (peak_kb - baseline_kb) / 1e3
    # Working set: one batch (2 x 240k samples ~ 2 MB) + buffers.  Allow
    # generous allocator slack but stay far below the file size.
    assert growth_mb < file_mb / 2, (growth_mb, file_mb)


def test_uint8_records_compact_transfer_end_to_end(tmp_path):
    """uint8-coded video records -> streaming source -> compact-transfer
    loader -> model loss: the whole chain is quantization-closed (the
    loader's x255 re-quantization exactly inverts the record decoder's
    /255), so the compact path's loss equals the fp32 path's."""
    import dataclasses

    import jax

    from avsr_tpu.data.loader import to_model_batch
    from avsr_tpu.models import seq2seq
    from tests.test_seq2seq import VOCAB, tiny_config

    rng = np.random.default_rng(7)
    utts = []
    for i in range(4):
        # pixel data on the uint8 grid; PCM on the int16 grid
        vid = (rng.integers(0, 256, (6, 12, 12, 1)) / 255.0).astype(np.float32)
        wav = (rng.integers(-32768, 32768, 4000) / 32767.0).astype(np.float32)
        utts.append(Utterance(uid=f"u{i}", transcript="abc",
                              waveform=wav, video=vid))
    path = str(tmp_path / "av.tfrecord")
    tfrecord.write_dataset(utts, path, video_codec="uint8")

    units = builtin_unit_dict("character")
    cfg = tiny_config("av_align")

    def batches(transfer):
        data_cfg = DataConfig(
            batch_size=4, audio_bucket_boundaries=(40,), max_label_length=8,
            transfer_dtype=transfer,
        )
        loader = BucketingLoader(
            TFRecordDataSource(path), units, data_cfg,
            require_audio=True, require_video=True,
        )
        [(_, b)] = list(loader.epoch(shuffle=False))
        return b

    b_fp = batches("float32")
    b_c = batches("compact")
    assert b_c["video"].dtype == np.uint8
    assert b_c["audio"].dtype == np.int16

    params = seq2seq.model_init(jax.random.PRNGKey(0), cfg, VOCAB)
    l_fp, _ = seq2seq.loss_fn(params, cfg, to_model_batch(b_fp), train=False)
    l_c, _ = seq2seq.loss_fn(params, cfg, to_model_batch(b_c), train=False)
    np.testing.assert_allclose(float(l_fp), float(l_c), rtol=1e-6)


def test_sharded_corpus_reads_as_one_dataset(tmp_path):
    """write_dataset(num_shards=N) -> open_sharded(glob) concatenates the
    shards into one deterministic random-access source; an AV uid-join
    over sharded audio + single-file video still pairs every utterance."""
    from avsr_tpu.data.grain_loader import (
        ConcatSource, JoinedAVSource, open_sharded,
    )
    from avsr_tpu.data.synthetic import SyntheticSpec, generate
    from avsr_tpu.data.tfrecord import write_dataset

    utts = generate(SyntheticSpec(num_utterances=11, seed=3, alphabet="abc"))
    base = str(tmp_path / "train.tfrecord")
    paths = write_dataset(utts, base, num_shards=4)
    assert len(paths) == 4 and all(os.path.exists(p) for p in paths)

    src = open_sharded(base + "-*")
    assert isinstance(src, ConcatSource)
    assert len(src) == 11
    assert src.uids() == [u.uid for u in utts]
    for i in (0, 3, 10):
        got = src[i]
        assert got.uid == utts[i].uid
        np.testing.assert_allclose(got.waveform, utts[i].waveform, atol=1e-6)

    # comma-list form, partial
    two = open_sharded(f"{paths[0]},{paths[2]}")
    assert len(two) == len(open_sharded(paths[0])) + len(open_sharded(paths[2]))

    # uid join across a sharded audio corpus and single-file video corpus
    video_path = str(tmp_path / "video.tfrecord")
    write_dataset(utts, video_path)
    joined = JoinedAVSource(open_sharded(base + "-*"),
                            open_sharded(video_path))
    assert len(joined) == 11
    u0 = joined[0]
    assert u0.video is not None and u0.waveform is not None

    # single literal path returns the plain source
    from avsr_tpu.data.grain_loader import TFRecordDataSource

    assert isinstance(open_sharded(paths[1]), TFRecordDataSource)
