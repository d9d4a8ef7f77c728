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


# ---------------------------------------------------------------------------
# Index keys (ipk / ivk) — VERDICT r4 #7: index once per circuit, load many.
# ---------------------------------------------------------------------------

def save_index_keys(path: str, kzg, ipk: dict, ivk: dict) -> None:
    """Persist both protocols' (ipk, ivk) as one ``.npz``.

    Covers every value type the Marlin/PLONK indexers emit
    (``models/marlin/indexer.py`` / ``models/plonk/indexer.py``, mirroring
    the reference's in-memory dicts at
    ``/root/reference/marlin/indexer.py:86-121`` and
    ``plonk/indexer.py:92-118``): the SRS ``ck`` (host list or DeviceSRS),
    the G2 ``rk``, index polynomials (stored as canonical coefficient
    int arrays), G1 commitments, subgroup element lists, vanishing
    polynomials, sigma_star, the R1CS matrices, and scalar metadata.
    Everything round-trips through canonical integers, so a key indexed
    with the TPU backend loads into a host-backend prover and vice versa.
    """
    from ..ops.host import curve as pc
    from ..ops.host.field import FieldElement
    from ..ops.host.poly import Poly
    from ..ops.srs import DeviceSRS
    from .fixtures import DenseMatrix, SparseMatrix

    arrays: dict[str, np.ndarray] = {}
    counter = [0]

    def hoist(values) -> str:
        key = f"arr{counter[0]}"
        counter[0] += 1
        arrays[key] = _ints_to_array(values)
        return key

    def enc_coord(c):
        """Fq or Fq2 coordinate -> int or [int, int]."""
        if hasattr(c, "c0"):
            return [int(c.c0), int(c.c1)]
        return int(c)

    def encode(obj):
        if isinstance(obj, DeviceSRS):
            affs = obj._curve.to_affine_ints(obj.points)
            return {"__srs__": {
                "x": hoist([a[0] for a in affs]),
                "y": hoist([a[1] for a in affs])}}
        if isinstance(obj, Poly):
            return {"__poly__": hoist([int(c) for c in obj.list()])}
        if isinstance(obj, FieldElement):
            return {"__fr__": int(obj)}
        if isinstance(obj, (DenseMatrix, SparseMatrix)):
            pos = obj.nonzero_positions()
            return {"__matrix__": {
                "nrows": obj.nrows(), "ncols": obj.ncols(),
                "dense": isinstance(obj, DenseMatrix),
                "ij": [[i, j] for i, j in pos],
                "vals": hoist([int(obj[i, j]) for i, j in pos])}}
        if isinstance(obj, tuple):          # projective point (G1 or G2)
            norm = pc.normalize(obj)
            if norm is None:
                return {"__point__": None}
            return {"__point__": [enc_coord(norm[0]), enc_coord(norm[1])]}
        if isinstance(obj, list):
            if obj and all(isinstance(v, FieldElement) for v in obj):
                return {"__frs__": hoist([int(v) for v in obj])}
            if obj and all(isinstance(v, tuple) for v in obj):
                # host ck: list of projective G1 points
                affs = [pc.normalize(p) for p in obj]
                return {"__srs__": {
                    "x": hoist([int(a[0]) for a in affs]),
                    "y": hoist([int(a[1]) for a in affs])}}
            return [encode(v) for v in obj]
        if isinstance(obj, dict):
            return {k: encode(v) for k, v in obj.items()}
        if isinstance(obj, (int, bool, str)) or obj is None:
            return obj
        raise TypeError(f"unsupported index-key element: {type(obj)}")

    header = {
        "curve_type": kzg.curve_type,
        "ipk": encode(ipk),
        "ivk": encode(ivk),
    }
    np.savez_compressed(
        path,
        header=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8),
        **arrays)


def load_index_keys(path: str, kzg, device: bool | None = None):
    """Load (ipk, ivk) saved by :func:`save_index_keys` into ``kzg``'s
    field/curve types.  ``device`` controls the ``ck`` flavor exactly as
    in :func:`load_srs` (None -> follow ``kzg.backend``)."""
    from ..ops.host.poly import Poly
    from .fixtures import DenseMatrix, SparseMatrix

    data = np.load(path)
    header = json.loads(bytes(data["header"]).decode())
    assert header["curve_type"] == kzg.curve_type, "curve mismatch"
    if device is None:
        device = kzg.backend == "tpu"
    Fp = type(kzg.G1[0])
    Fr = kzg.Fq

    def ints(key):
        return _array_to_ints(data[key])

    def dec_coord(c):
        if isinstance(c, list):
            return kzg._Fq2(c[0], c[1])
        return Fp(c)

    def decode(obj):
        if isinstance(obj, dict):
            if "__srs__" in obj:
                xs = ints(obj["__srs__"]["x"])
                ys = ints(obj["__srs__"]["y"])
                if device:
                    from ..ops.msm import msm_context
                    from ..ops.srs import DeviceSRS
                    curve = msm_context(kzg.curve_type).curve
                    return DeviceSRS(kzg.curve_type,
                                     curve.from_affine_ints(xs, ys))
                return [(Fp(x), Fp(y), Fp(1)) for x, y in zip(xs, ys)]
            if "__poly__" in obj:
                return Poly(Fr, [Fr(c) for c in ints(obj["__poly__"])])
            if "__fr__" in obj:
                return Fr(obj["__fr__"])
            if "__frs__" in obj:
                return [Fr(v) for v in ints(obj["__frs__"])]
            if "__matrix__" in obj:
                m = obj["__matrix__"]
                vals = ints(m["vals"])
                entries = {(i, j): Fr(v)
                           for (i, j), v in zip(m["ij"], vals)}
                if m["dense"]:
                    rows = [[entries.get((i, j), Fr(0))
                             for j in range(m["ncols"])]
                            for i in range(m["nrows"])]
                    return DenseMatrix(Fr, rows)
                return SparseMatrix(Fr, m["nrows"], m["ncols"], entries)
            if "__point__" in obj:
                if obj["__point__"] is None:
                    return kzg.Z1        # identity (e.g. zero-poly commit)
                cx, cy = (dec_coord(c) for c in obj["__point__"])
                if isinstance(obj["__point__"][0], list):   # G2 (Fq2)
                    return (cx, cy, kzg._Fq2.one())
                return (cx, cy, Fp(1))
            return {k: decode(v) for k, v in obj.items()}
        if isinstance(obj, list):
            return [decode(v) for v in obj]
        return obj

    return decode(header["ipk"]), decode(header["ivk"])


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
