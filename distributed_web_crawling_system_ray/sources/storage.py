"""Payload table sink/source: Lance when available, Parquet otherwise.

The north-star format for the image+caption payload is Lance
(BASELINE.json input_hint); this container does not ship the ``lance``
package, so the live (tested) path is partitioned Parquet with
``compression="none"`` (the bytes column is already image-compressed).
The Lance branch is the same call shape behind an import guard —
activating it changes no call sites.
"""

from __future__ import annotations

import os

try:  # pragma: no cover - not installed in this container
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def write_payload(ds, out_dir: str) -> None:
    """Write a payload Dataset to ``out_dir`` (one partition directory)."""
    if HAVE_LANCE:  # pragma: no cover
        ds.write_lance(out_dir)
    else:
        ds.write_parquet(out_dir, compression="none")


def payload_files(root: str) -> list[str]:
    """All payload data files under a partitioned output root."""
    ext = ".lance" if HAVE_LANCE else ".parquet"
    out: list[str] = []
    for d in sorted(os.listdir(root)):
        if not d.startswith("round="):
            continue
        rd = os.path.join(root, d)
        out.extend(
            os.path.join(rd, f) for f in sorted(os.listdir(rd)) if f.endswith(ext)
        )
    return out


def read_payload(root: str):
    """Read the full partitioned payload as a Dataset."""
    import ray.data

    if HAVE_LANCE:  # pragma: no cover
        parts = [
            os.path.join(root, d)
            for d in sorted(os.listdir(root))
            if d.startswith("round=")
        ]
        import pyarrow as pa

        dses = [ray.data.read_lance(p) for p in parts]
        out = dses[0]
        for d in dses[1:]:
            out = out.union(d)
        return out
    files = payload_files(root)
    if not files:
        from distributed_web_crawling_system_ray.schema import PAYLOAD

        return ray.data.from_arrow(PAYLOAD.empty_table())
    return ray.data.read_parquet(files)
