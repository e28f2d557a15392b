"""MetricsLogger JSONL sink + tracker gating."""

import pytest

from jiminy_tpu.rl import MetricsLogger, read_metrics


def test_jsonl_roundtrip(tmp_path):
    with MetricsLogger(tmp_path / "run") as lg:
        lg.log(0, {"reward_mean": 1.5, "kl": 0.01})
        lg.log(10, {"reward_mean": 2.0, "kl": 0.02})
    rows = read_metrics(tmp_path / "run")
    assert [r["step"] for r in rows] == [0, 10]
    assert rows[1]["reward_mean"] == 2.0
    assert all("wall_s" in r for r in rows)


def test_append_across_sessions(tmp_path):
    lg = MetricsLogger(tmp_path / "run")
    lg.log(0, {"a": 1})
    lg.close()
    lg = MetricsLogger(tmp_path / "run")  # resume: append, don't truncate
    lg.log(1, {"a": 2})
    lg.close()
    assert len(read_metrics(tmp_path / "run")) == 2


def test_wandb_gating(tmp_path):
    try:
        import wandb  # noqa: F401

        pytest.skip("wandb installed; gating path not reachable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="wandb"):
        MetricsLogger(tmp_path / "run", use_wandb=True)
