"""CLI (`python -m exmc_tpu`) smoke tests: check / sample / summary."""

import json

import numpy as np
import pytest

from exmc_tpu.__main__ import main

STAN = """
data { int N; array[N] real y; }
parameters { real mu; real<lower=0> sigma; }
model {
  mu ~ normal(0, 5);
  sigma ~ normal(0, 2);
  y ~ normal(mu, sigma);
}
"""

BAD_STAN = "parameters { real mu; }\nmodel { mu ~ nrmal(0, 1); }"


@pytest.fixture(scope="module")
def model_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    model = d / "m.stan"
    model.write_text(STAN)
    data = d / "d.json"
    rng = np.random.default_rng(0)
    data.write_text(json.dumps(
        {"N": 12, "y": (2.0 + rng.normal(size=12)).round(3).tolist()}
    ))
    return str(model), str(data), d


def test_check_ok(model_files, capsys):
    model, data, _ = model_files
    assert main(["check", model, "--data", data]) == 0
    out = capsys.readouterr().out
    assert "OK" in out
    assert "unconstrained dimension: 2" in out
    assert "mu" in out and "sigma" in out
    assert "observation terms: 1" in out


def test_check_syntax_error(model_files, capsys):
    _, _, d = model_files
    bad = d / "bad.stan"
    bad.write_text(BAD_STAN)
    assert main(["check", str(bad)]) == 1
    assert "FAIL" in capsys.readouterr().err


def test_sample_summary_roundtrip(model_files, capsys):
    model, data, d = model_files
    for ext in ("npz", "json"):
        fit = str(d / f"fit.{ext}")
        rc = main([
            "sample", model, "--data", data, "--chains", "2",
            "--warmup", "40", "--samples", "30", "--seed", "1",
            "--output", fit,
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "divergences:" in out and "mu" in out

        assert main(["summary", fit]) == 0
        out = capsys.readouterr().out
        assert "mu" in out and "sigma" in out

    groups = np.load(str(d / "fit.npz"))
    mu = groups["posterior/mu"]
    assert mu.shape == (2, 30)
    assert 0.0 < float(mu.mean()) < 4.0


def test_optimize_cmd(model_files, capsys):
    model, data, _ = model_files
    assert main(["optimize", model, "--data", data]) == 0
    out = capsys.readouterr().out
    assert "MAP (converged" in out and "mu" in out


def test_variational_cmd(model_files, capsys):
    model, data, d = model_files
    fit = str(d / "vi.json")
    rc = main(["variational", model, "--data", data,
               "--iters", "800", "--draws", "100", "--output", fit])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ADVI" in out and "mu" in out
    loaded = json.load(open(fit))
    assert np.asarray(loaded["posterior"]["mu"]).shape == (1, 100)


def test_sample_engine_forwards_tuning(model_files, monkeypatch):
    """--warmup / --target-accept / --no-ncp must reach non-NUTS
    engines (review fix: they were silently dropped)."""
    model, data, _ = model_files
    captured = {}
    from exmc_tpu.stan import frontend

    def fake_sample(code, d, **opts):
        captured.update(opts)
        return ({"mu": np.zeros((2, 4))},
                {"diverging": np.zeros((2, 4))})

    monkeypatch.setattr(frontend, "sample", fake_sample)
    assert main(["sample", model, "--data", data, "--engine", "chees",
                 "--warmup", "77", "--target-accept", "0.9",
                 "--no-ncp"]) == 0
    assert captured["engine"] == "chees"
    assert captured["num_warmup"] == 77
    assert captured["target_accept"] == 0.9
    assert captured["ncp"] is False


def test_sample_unset_flags_keep_engine_defaults(model_files, monkeypatch,
                                                 capsys):
    """Unset tuning flags are omitted so each engine keeps its own
    defaults (ChEES target_accept 0.651, not NUTS's 0.8); MEADS warns
    that --target-accept is ignored."""
    model, data, _ = model_files
    captured = {}
    from exmc_tpu.stan import frontend

    def fake_sample(code, d, **opts):
        captured.update(opts)
        return ({"mu": np.zeros((2, 4))},
                {"diverging": np.zeros((2, 4))})

    monkeypatch.setattr(frontend, "sample", fake_sample)
    assert main(["sample", model, "--data", data, "--engine",
                 "snaper"]) == 0
    for absent in ("num_warmup", "target_accept", "max_tree_depth"):
        assert absent not in captured, absent

    captured.clear()
    assert main(["sample", model, "--data", data, "--engine", "meads",
                 "--target-accept", "0.9", "--max-depth", "8"]) == 0
    assert "target_accept" not in captured
    assert "max_tree_depth" not in captured
    err = capsys.readouterr().err
    assert "--target-accept is ignored" in err
    assert "--max-depth is ignored" in err


def test_load_data_uses_default_dtype(tmp_path):
    """Data arrays honor the configured default dtype instead of a
    hardcoded float32 (review fix); ints and bools stay integral."""
    from exmc_tpu.__main__ import _load_data
    from exmc_tpu.config import default_dtype

    p = tmp_path / "d.json"
    p.write_text(json.dumps({"N": 3, "y": [1.0, 2.0, 3.0], "flag": True}))
    out = _load_data(str(p))
    assert out["N"] == 3 and isinstance(out["N"], int)
    assert out["flag"] == 1
    assert out["y"].dtype == np.dtype(default_dtype().__name__)
