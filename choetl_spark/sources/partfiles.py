"""Shared task-side part-file writer for the format bridges.

Avro/BSON/YAML fallback writers all follow the same shape: clear stale
part files, then each task streams its Arrow batches through a
format-specific encoder into one ``part-<uuid>.<ext>`` file under the
output directory. Centralized here so the overwrite semantics and the
task-retry caveat live in ONE place.

Task-retry caveat (applies to every bridge): a retried/speculated task
writes a second uuid-named part file and both survive — the jar-backed
writers' commit protocols are the cluster answer; these bridges target
jar-less single-attempt use (tests, sandboxes, small interchange jobs).
"""

from __future__ import annotations

import glob
import os
import uuid
from collections.abc import Callable, Iterator


def write_part_files(
    df,
    path: str,
    ext: str,
    encode_batches: Callable,
) -> None:
    """``encode_batches(batches, fh) -> n_rows`` writes one part file.

    ``fh`` is opened in binary mode; text formats encode themselves.
    Empty parts are removed so globs see only real data files.
    """
    os.makedirs(path, exist_ok=True)
    for old in glob.glob(os.path.join(path, f"*.{ext}")):
        os.unlink(old)

    def part(batches: Iterator):
        import pyarrow as pa

        fname = os.path.join(path, f"part-{uuid.uuid4().hex}.{ext}")
        with open(fname, "wb") as fh:
            n = encode_batches(batches, fh)
        if n == 0:
            os.unlink(fname)
        yield pa.RecordBatch.from_arrays(
            [pa.array([fname]), pa.array([n], type=pa.int64())],
            names=["file", "n_rows"],
        )

    df.mapInArrow(part, "file string, n_rows long").collect()
