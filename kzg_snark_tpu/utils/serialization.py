"""Persistence for SRS / proving keys / verification keys / proofs.

The reference regenerates the SRS (with a fresh tau!) on every
``preprocess`` call and keeps keys as in-memory dicts
(``/root/reference/marlin/indexer.py:86-121``); SURVEY.md §5 calls out
serializable artifacts as a required addition — indexing once per circuit,
and all hosts of a distributed run loading the same SRS instead of sampling
their own.

Format: a single ``.npz`` per artifact — limb arrays for device data,
JSON-encoded header for scalars/metadata.  Everything round-trips through
canonical integers, so files are portable across backends and layouts.
"""

from __future__ import annotations

import json

import numpy as np


def _ints_to_array(values) -> np.ndarray:
    """ints -> (N, 32) uint8 big-endian rows."""
    return np.frombuffer(
        b"".join(int(v).to_bytes(32, "big") for v in values),
        dtype=np.uint8).reshape(len(list(values)), 32).copy()


def _array_to_ints(arr) -> list[int]:
    return [int.from_bytes(bytes(row), "big") for row in arr]


def save_srs(path: str, kzg, ck, rk) -> None:
    """Persist (ck, rk).  ck may be a host list of projective tuples or a
    DeviceSRS; stored as affine coordinate integers either way."""
    from ..ops.host import curve as pc
    from ..ops.srs import DeviceSRS

    if isinstance(ck, DeviceSRS):
        curve = ck._curve
        affs = curve.to_affine_ints(ck.points)
    else:
        affs = []
        for pt in ck:
            a = pc.normalize(pt)
            affs.append((int(a[0]), int(a[1])))
    rk_aff = pc.normalize(rk)
    header = {
        "curve_type": kzg.curve_type,
        "max_degree": len(affs) - 1,
        "rk": [[rk_aff[0].c0, rk_aff[0].c1], [rk_aff[1].c0, rk_aff[1].c1]],
    }
    np.savez_compressed(
        path,
        header=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8),
        g1_x=_ints_to_array([a[0] for a in affs]),
        g1_y=_ints_to_array([a[1] for a in affs]),
    )


def load_srs(path: str, kzg, device: bool | None = None):
    """Load (ck, rk).  device=True returns a DeviceSRS (default for
    backend='tpu' KZG instances), else a host projective list."""
    data = np.load(path)
    header = json.loads(bytes(data["header"]).decode())
    assert header["curve_type"] == kzg.curve_type, "curve mismatch"
    xs = _array_to_ints(data["g1_x"])
    ys = _array_to_ints(data["g1_y"])
    rk_raw = header["rk"]
    rk = (kzg._Fq2(*rk_raw[0]), kzg._Fq2(*rk_raw[1]), kzg._Fq2.one())

    if device is None:
        device = kzg.backend == "tpu"
    if device:
        from ..ops.msm import msm_context
        from ..ops.srs import DeviceSRS
        curve = msm_context(kzg.curve_type).curve
        return DeviceSRS(kzg.curve_type, curve.from_affine_ints(xs, ys)), rk
    Fp = type(kzg.G1[0])
    ck = [(Fp(x), Fp(y), Fp(1)) for x, y in zip(xs, ys)]
    return ck, rk


def save_proof(path: str, proof: dict) -> None:
    """Persist a Marlin or PLONK proof dict (commitments as projective int
    triples, field elements as ints)."""
    from ..ops.host.field import FieldElement

    def encode(obj):
        if isinstance(obj, dict):
            return {k: encode(v) for k, v in obj.items()}
        if isinstance(obj, (list,)):
            return [encode(v) for v in obj]
        if isinstance(obj, tuple):  # projective point
            return {"__point__": [int(c) for c in obj]}
        if isinstance(obj, FieldElement):
            return {"__fr__": int(obj)}
        if isinstance(obj, int):
            return {"__fr__": obj}
        raise TypeError(f"unsupported proof element: {type(obj)}")

    with open(path, "w") as f:
        json.dump(encode(proof), f)


def load_proof(path: str, kzg) -> dict:
    Fp = type(kzg.G1[0])
    Fr = kzg.Fq

    def decode(obj):
        if isinstance(obj, dict):
            if "__point__" in obj:
                return tuple(Fp(c) for c in obj["__point__"])
            if "__fr__" in obj:
                return Fr(obj["__fr__"])
            return {k: decode(v) for k, v in obj.items()}
        if isinstance(obj, list):
            return [decode(v) for v in obj]
        raise TypeError(f"unsupported proof element: {type(obj)}")

    with open(path) as f:
        return decode(json.load(f))
