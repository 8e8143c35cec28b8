"""Shared persisted-ANN-index manifest.

The IVF (similarity.py) and IVF-PQ (pq.py) families persist the same
architecture — a cluster-partitioned parquet relation plus kilobyte
sidecar tables (centroids, PQ codebooks). This module gives both ONE
on-disk contract:

    <index>/
      _INDEX_MANIFEST.json   # format_version, kind, params, centroids…
      assigned/ | codes/     # cluster-partitioned parquet

so readers validate the same way (pointed errors for a missing/alien/
future-versioned index), and both kinds share the append path's
nearest-centroid assignment. Legacy round-1/2 indexes (bare
centroids.json / codebooks.json sidecars) still read — they are
upgraded to a manifest on the next append.
"""

from __future__ import annotations

import json
import os
from typing import Any

MANIFEST = "_INDEX_MANIFEST.json"
FORMAT_VERSION = 1

#: kind -> (data subdirectory, required manifest fields)
_KINDS = {
    "ivf": ("assigned", ("centroids",)),
    "ivfpq": ("codes", ("centroids", "codebooks")),
}


class IndexFormatError(ValueError):
    """Missing, alien, or future-versioned persisted index."""


def data_dir(path: str, kind: str) -> str:
    return os.path.join(path, _KINDS[kind][0])


def write_manifest(path: str, kind: str, **meta: Any) -> None:
    if kind not in _KINDS:
        raise IndexFormatError(f"unknown index kind {kind!r}")
    missing = [f for f in _KINDS[kind][1] if f not in meta]
    if missing:
        raise IndexFormatError(f"{kind} manifest missing fields: {missing}")
    os.makedirs(path, exist_ok=True)
    doc = {"format_version": FORMAT_VERSION, "kind": kind, **meta}
    with open(os.path.join(path, MANIFEST), "w") as fh:
        json.dump(doc, fh)


def read_manifest(
    path: str, expect_kind: str | None = None, upgrade: bool = False
) -> dict:
    """Validated manifest load; understands the legacy sidecar layout
    (centroids.json / codebooks.json, no manifest) as version 0.

    With ``upgrade=True`` a legacy layout is rewritten as a current
    manifest in place (the append paths pass this, so any write-visit
    to a legacy index leaves it versioned; the old sidecars stay as
    harmless leftovers — the manifest takes precedence)."""
    mf = os.path.join(path, MANIFEST)
    if os.path.exists(mf):
        with open(mf) as fh:
            doc = json.load(fh)
        ver = doc.get("format_version")
        if not isinstance(ver, int) or ver > FORMAT_VERSION:
            raise IndexFormatError(
                f"index at {path} has format_version {ver!r}; this build "
                f"reads <= {FORMAT_VERSION}"
            )
        kind = doc.get("kind")
        if kind not in _KINDS:
            raise IndexFormatError(f"index at {path} has unknown kind {kind!r}")
        if expect_kind is not None and kind != expect_kind:
            raise IndexFormatError(
                f"expected a {expect_kind} index at {path}, found {kind}"
            )
        missing = [f for f in _KINDS[kind][1] if f not in doc]
        if missing:
            raise IndexFormatError(
                f"{kind} manifest at {path} missing fields: {missing}"
            )
        doc["centroids"] = [(int(c), v) for c, v in doc["centroids"]]
        return doc
    # ---- legacy sidecars (pre-manifest snapshots) ----
    cj = os.path.join(path, "centroids.json")
    if not os.path.exists(cj):
        raise IndexFormatError(f"no index manifest or centroids at {path}")
    with open(cj) as fh:
        centroids = [(int(c), v) for c, v in json.load(fh)]
    doc = {"format_version": 0, "centroids": centroids}
    bj = os.path.join(path, "codebooks.json")
    if os.path.exists(bj):
        with open(bj) as fh:
            doc["codebooks"] = json.load(fh)
        doc["kind"] = "ivfpq"
    else:
        doc["kind"] = "ivf"
    if expect_kind is not None and doc["kind"] != expect_kind:
        raise IndexFormatError(
            f"expected a {expect_kind} index at {path}, found {doc['kind']}"
        )
    if upgrade:
        meta = {k: v for k, v in doc.items() if k not in ("format_version", "kind")}
        write_manifest(path, doc["kind"], **meta)
        doc["format_version"] = FORMAT_VERSION
    return doc
