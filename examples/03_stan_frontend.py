"""Stan-subset frontend (reference notebooks' Stan examples)."""

import os

from exmc_tpu import stan

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

CODE = """
data { real y; }
parameters {
  real mu;
  real<lower=0> sigma;
}
model {
  mu ~ normal(0, 10);
  sigma ~ half_normal(2);
  y ~ normal(mu, sigma);
}
"""


def main():
    n = 100 if SMOKE else 1000
    trace, stats = stan.sample(CODE, {"y": 5.0}, num_warmup=max(200, n // 2),
                               num_samples=n, seed=0)
    print("mu:", float(trace["mu"].mean()), "sigma:", float(trace["sigma"].mean()))


if __name__ == "__main__":
    main()
