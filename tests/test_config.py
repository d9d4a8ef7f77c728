"""FrameworkConfig: the single dataclass behind the env-var knob surface
(SURVEY.md §5; VERDICT r3 weak #8)."""

from kzg_snark_tpu.config import FrameworkConfig


APPLY_VARS = (
    "KZG_TPU_PALLAS", "KZG_TPU_NTT_MODE", "KZG_TPU_CHECKED",
    "KZG_TPU_COMPLETE_ADD", "KZG_TPU_JAX_CACHE", "KZG_TPU_JAX_CACHE_FORCE",
    "KZG_TPU_RUNSLOW", "KZG_BENCH_SECTION_TIMEOUT", "KZG_BENCH_ONLY",
)


def test_apply_and_from_env_roundtrip(monkeypatch):
    # Snapshot/restore every var apply() touches via monkeypatch so the
    # test cannot clobber user/CI-set knobs (e.g. KZG_TPU_RUNSLOW=1) for
    # later lazily-reading tests in this process (ADVICE r4 low).
    import os
    for var in APPLY_VARS:
        if var in os.environ:
            monkeypatch.setenv(var, os.environ[var])
        else:
            monkeypatch.delenv(var, raising=False)
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
    assert os.environ["KZG_TPU_CHECKED"] == "1"
    # None fields clear stale env values (config.apply contract)
    monkeypatch.setenv("KZG_BENCH_ONLY", "stale")
    monkeypatch.setenv("KZG_TPU_JAX_CACHE", "/stale")
    FrameworkConfig(bench_only=None, cache_dir=None).apply()
    assert "KZG_BENCH_ONLY" not in os.environ
    assert "KZG_TPU_JAX_CACHE" not in os.environ
    assert FrameworkConfig.from_env().checked is False


def test_make_kzg_host_backend():
    cfg = FrameworkConfig(curve="bn254", backend="host", rng_seed=11)
    kzg = cfg.make_kzg()
    assert kzg.curve_type == "bn254"
    d = cfg.as_dict()
    assert d["backend"] == "host" and "curve" in d
