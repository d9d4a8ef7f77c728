"""FrameworkConfig: the single dataclass behind the env-var knob surface
(SURVEY.md §5; VERDICT r3 weak #8)."""

from kzg_snark_tpu.config import FrameworkConfig


def test_apply_and_from_env_roundtrip(monkeypatch):
    cfg = FrameworkConfig(pallas="off", ntt_mode="scan", checked=True,
                          complete_add=True, runslow=True,
                          bench_timeout=123)
    cfg.apply()
    back = FrameworkConfig.from_env()
    assert back.pallas == "off"
    assert back.ntt_mode == "scan"
    assert back.checked and back.complete_add and back.runslow
    assert back.bench_timeout == 123
    # consumers see the applied values
    import os
    assert os.environ["KZG_TPU_CHECKED"] == "1"
    # restore defaults for the rest of the suite
    FrameworkConfig().apply()
    assert FrameworkConfig.from_env().checked is False


def test_make_kzg_host_backend():
    cfg = FrameworkConfig(curve="bn254", backend="host", rng_seed=11)
    kzg = cfg.make_kzg()
    assert kzg.curve_type == "bn254"
    d = cfg.as_dict()
    assert d["backend"] == "host" and "curve" in d
