"""The driver records only the last ~2000 bytes of bench stdout and parses
the final line out of that buffer (BENCH_r04.json recorded ``parsed: null``
because the full-extras headline outgrew it).  Pin the invariant: every
line `_emit` prints is valid JSON under 1900 bytes, in the best case (all
sections populated) and the worst (every section carrying an error string).
"""

import importlib.util
import io
import json
import os
import contextlib

_BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _capture_emit(bench, attempted, tmp_path):
    # Redirect the detail file: the default path is the repo-root
    # BENCH_DETAIL.json, which a live bench run owns.
    os.environ["KZG_BENCH_DETAIL"] = str(tmp_path / "detail.json")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bench._emit(attempted)
    finally:
        del os.environ["KZG_BENCH_DETAIL"]
    line = buf.getvalue().strip().splitlines()[-1]
    return line


def test_emit_full_success_line_fits_driver_buffer(tmp_path):
    bench = _load_bench()
    attempted = {
        "hw_probe": {"vpu_u32_madds_per_s": 7.2e11, "mxu_int8_madds_per_s":
                     1.87e14, "batch_inv_modmul_equiv_per_add": 247.6,
                     "vpu_chain_s": 0.78, "mxu_chain_s": 0.59},
        "msm_1048576": {"msm_rate": 1511846.0, "msm_size": 1 << 20,
                        "msm_oracle_ok": True, "msm_first_s": 401.16,
                        "msm_steady_s": 0.6936, "basis_build_s": 143.4},
        "ntt": {"ntt20_ms": 22.54, "intt20_ms": 24.21,
                "ntt20_roundtrip_exact": True, "ntt20_hbm_floor_ms": 1.68,
                "ntt20_compute_floor_ms": 9.53, "ntt_parity_spot_ok": True},
        "bls_65536": {"bls_msm_rate": 500616.4, "bls_oracle_ok": True,
                      "bls_msm_size": 1 << 16},
        "msm_65536": {"msm16_srs_rate": 825954.2, "msm_additivity_ok": True,
                      "srs_setup_s": 408.4, "srs_size": 1 << 16},
        "msm_batch8": {"msm_batch8_rate": 1678046.2,
                       "msm_batch8_size": 1 << 20},
        "plonk": {"plonk_n": 1 << 16, "plonk_prove_s": 35.51,
                  "plonk_proofs_per_s": 0.0282, "plonk_verify_ok": True,
                  "plonk_phases_ms": {f"phase{i}": 1234.5 for i in range(9)}},
        "marlin": {"marlin_prove_s": 1702.98, "marlin_e2e_ok": True,
                   "marlin_index_s": 381.8, "marlin_verify_s": 0.325},
    }
    line = _capture_emit(bench, attempted, tmp_path)
    assert len(line) < 1900, len(line)
    parsed = json.loads(line)
    assert parsed["metric"] == "g1_msm_points_per_sec_per_chip"
    assert parsed["value"] == 1511846.0
    ex = parsed["extras"]
    # Every essential oracle flag and scalar survives compaction.
    for key in ("msm_rate", "msm_oracle_ok", "ntt20_ms", "plonk_proofs_per_s",
                "plonk_verify_ok", "marlin_e2e_ok", "bls_oracle_ok",
                "msm_additivity_ok", "msm_batch8_rate", "msm16_srs_rate"):
        assert key in ex, key
    assert all(v == "ok" for v in ex["sections"].values())
    # The full extras (incl. the bulky roofline + phase map) land on disk.
    detail = json.load(open(str(tmp_path /
                                         "detail.json")))
    assert "roofline" in detail["extras"]
    assert "plonk_phases_ms" in detail["extras"]


def test_emit_worst_case_errors_still_fit(tmp_path):
    bench = _load_bench()
    long_err = "JaxRuntimeError: UNAVAILABLE: TPU worker process crashed " \
               "or restarted mid-section with a very long diagnostic " * 4
    attempted = {name: {"error": long_err} for name, _ in bench.SECTIONS}
    line = _capture_emit(bench, attempted, tmp_path)
    assert len(line) < 1900, len(line)
    parsed = json.loads(line)
    assert parsed["value"] == 0.0
    assert all(len(v) <= 48 for v in parsed["extras"]["sections"].values())


def test_emit_initial_empty_line_valid(tmp_path):
    bench = _load_bench()
    line = _capture_emit(bench, {}, tmp_path)
    parsed = json.loads(line)
    assert parsed["vs_baseline"] == 0.0
    assert parsed["extras"]["sections"] == {}
