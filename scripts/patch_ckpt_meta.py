#!/usr/bin/env python
"""Rewrite depth-anchor metadata of an estimator checkpoint.

The checkpoint loader (adapose.py::load) validates every arch knob in the
saved metadata against the live config and refuses on mismatch. That guard
is right for shape-changing knobs (backend, strides, volume size), but
``d_min``/``d_interval`` only move the plane-sweep depth HYPOTHESES — the
weights are shape-compatible across depth grids, and fine-tuning from a
coarse-grid checkpoint onto a finer grid converges far faster than random
init. This tool re-anchors those two fields so a fine-depth run can seed
from a coarse-depth checkpoint (used for the r5 mug fine-depth estimator).

    python scripts/patch_ckpt_meta.py SRC DST d_min=0.35 d_interval=0.08
"""
import json
import os
import sys

from flax import serialization


def main():
    src, dst = sys.argv[1], sys.argv[2]
    patch = dict(kv.split("=", 1) for kv in sys.argv[3:])
    allowed = {"d_min", "d_interval"}
    bad = set(patch) - allowed
    if bad:
        raise SystemExit(f"refusing to patch shape-affecting knobs: {bad}")
    with open(src, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    meta = json.loads(blob["meta"])
    for k, v in patch.items():
        print(f"{k}: {meta.get(k)} -> {float(v)}")
        meta[k] = float(v)
    blob["meta"] = json.dumps(meta)
    tmp = dst + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(blob))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, dst)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
