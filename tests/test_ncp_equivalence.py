"""NCP and centered parameterizations target the SAME posterior —
the strongest correctness check on the NCP rewrite + reconstruction."""

import numpy as np

from exmc_tpu import Builder, dists, sample


def _hier_ir():
    rng = np.random.default_rng(0)
    ys = {g: rng.normal(1.0 + g, 1.0, size=15) for g in range(3)}
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "tau", dists.HalfNormal, {"sigma": 2.0})
    for g in range(3):
        ir = Builder.rv(ir, f"theta_{g}", dists.Normal,
                        {"mu": "mu", "sigma": "tau"})
        ir = Builder.rv(ir, f"y_{g}", dists.Normal,
                        {"mu": f"theta_{g}", "sigma": 1.0})
        ir = Builder.obs(ir, f"y_{g}_obs", f"y_{g}", ys[g])
    return ir


def test_ncp_and_centered_agree():
    ir = _hier_ir()
    t_ncp, s_ncp = sample(ir, ncp=True, num_chains=4, num_warmup=500,
                          num_samples=500, seed=0)
    t_cen, s_cen = sample(ir, ncp=False, num_chains=4, num_warmup=500,
                          num_samples=500, seed=1)
    for name in ["mu", "tau", "theta_0", "theta_1", "theta_2"]:
        m1, m2 = float(t_ncp[name].mean()), float(t_cen[name].mean())
        sd = float(t_cen[name].std()) + 1e-6
        assert abs(m1 - m2) < 0.35 * sd + 0.1, (name, m1, m2)
        s1, s2 = float(t_ncp[name].std()), float(t_cen[name].std())
        assert 0.7 < s1 / s2 < 1.4, (name, s1, s2)
