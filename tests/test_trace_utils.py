import numpy as np

from exmc_tpu import Builder, dists, sample
from exmc_tpu.trace_utils import summary_table, to_inference_dict


def test_to_inference_dict_and_summary_table():
    ys = np.array([2.1, 1.8, 2.5, 2.0])
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": 0.5})
    ir = Builder.obs(ir, "x_obs", "x", ys)
    trace, stats = sample(ir, num_chains=2, num_warmup=150, num_samples=100,
                          seed=0)
    idata = to_inference_dict(trace, stats)
    assert idata["posterior"]["mu"].shape == (2, 100)
    ss = idata["sample_stats"]
    for key in ("diverging", "energy", "tree_depth", "acceptance_rate", "lp"):
        assert ss[key].shape[:2] == (2, 100), key
    table = summary_table(trace)
    assert "mu" in table and "rhat" in table
