"""Stan translations, end to end through the frontend (reference
notebooks/bda/stan_translations.livemd: 13 BDA-course .stan files
side-by-side; the reference translates them into Builder calls — here
the Stan SOURCE compiles directly).

Six representative programs run as-is: Bernoulli, Binomial,
linear regression, Student-t robust regression, logistic regression
with a Student-t prior, and the course's capstone — the Kilpisjärvi
summer-temperature trend on the REAL bundled dataset, with a
``generated quantities`` block predicting 2030.
"""

import os

import numpy as np

from exmc_tpu import stan
from exmc_tpu.datasets import load_kilpisjarvi

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"
N_DRAWS = 300 if SMOKE else 1000


def run(name, code, data, check):
    trace, _ = stan.sample(code, data, num_chains=4,
                           num_warmup=max(300, N_DRAWS // 2),
                           num_samples=N_DRAWS, seed=0)
    check(trace)
    print(f"[{name}] OK")
    return trace


def main():
    rng = np.random.default_rng(0)

    # 1. bern.stan
    y = (rng.random(50) < 0.7).astype(np.float32)
    run("bern       ", """
        data { int N; vector[N] y; }
        parameters { real<lower=0, upper=1> theta; }
        model { theta ~ beta(1, 1); y ~ bernoulli(theta); }
        """, {"N": 50, "y": y},
        lambda t: np.testing.assert_allclose(
            t["theta"].mean(), (y.sum() + 1) / 52, atol=0.03))

    # 2. binom.stan (conjugate check: Beta(1+y, 1+N-y))
    run("binom      ", """
        data { real y; real N; }
        parameters { real<lower=0, upper=1> theta; }
        model { theta ~ beta(1, 1); y ~ binomial(N, theta); }
        """, {"y": 43.0, "N": 200.0},
        lambda t: np.testing.assert_allclose(
            t["theta"].mean(), 44 / 202, atol=0.02))

    # 5. lin.stan (ordinary least squares agreement)
    x = rng.normal(0, 1, 60)
    yl = (1.5 + 2.0 * x + rng.normal(0, 0.7, 60)).astype(np.float32)
    bhat = np.polyfit(x, yl, 1)
    run("lin        ", """
        data { int N; vector[N] x; vector[N] y; }
        parameters { real alpha; real beta; real<lower=0> sigma; }
        model {
          alpha ~ normal(0, 10); beta ~ normal(0, 10);
          sigma ~ half_normal(5);
          y ~ normal(alpha + beta * x, sigma);
        }
        """, {"N": 60, "x": x.astype(np.float32), "y": yl},
        lambda t: np.testing.assert_allclose(
            [t["alpha"].mean(), t["beta"].mean()],
            [bhat[1], bhat[0]], atol=0.15))

    # 7. lin_t.stan — one gross outlier; the t likelihood shrugs it off
    yl_out = yl.copy()
    yl_out[0] += 25.0
    t_t = run("lin_t      ", """
        data { int N; vector[N] x; vector[N] y; }
        parameters { real alpha; real beta; real<lower=0> sigma; }
        model {
          alpha ~ normal(0, 10); beta ~ normal(0, 10);
          sigma ~ half_normal(5);
          y ~ student_t(4, alpha + beta * x, sigma);
        }
        """, {"N": 60, "x": x.astype(np.float32), "y": yl_out},
        lambda t: np.testing.assert_allclose(
            t["beta"].mean(), 2.0, atol=0.25))

    # 11. logistic_t.stan
    X = rng.normal(size=(120, 3)).astype(np.float32)
    bt = np.array([1.0, -0.8, 0.5])
    yb = (rng.random(120) < 1 / (1 + np.exp(-(X @ bt)))).astype(np.float32)
    run("logistic_t ", """
        data { int N; int K; matrix[N, K] X; vector[N] y; }
        parameters { vector[K] beta; }
        model {
          beta ~ student_t(3, 0, 1);
          y ~ bernoulli(sigmoid(X * beta));
        }
        """, {"N": 120, "K": 3, "X": X, "y": yb},
        lambda t: np.testing.assert_allclose(
            np.sign(t["beta"].mean(axis=(0, 1))), np.sign(bt)))

    # 13. Kilpisjarvi end-to-end on the REAL record, with GQ prediction
    k = load_kilpisjarvi()
    xs = ((k["year"] - k["year"].mean()) / 10.0).astype(np.float32)
    ys = k["temp_summer"].astype(np.float32)
    x2030 = float((2030 - k["year"].mean()) / 10.0)
    trace, _ = stan.sample("""
        data { int N; vector[N] x; vector[N] y; real x_pred; }
        parameters { real alpha; real beta; real<lower=0> sigma; }
        model {
          alpha ~ normal(10, 10); beta ~ normal(0, 1);
          sigma ~ half_normal(5);
          y ~ normal(alpha + beta * x, sigma);
        }
        generated quantities {
          real temp_2030 = alpha + beta * x_pred;
          real pred_2030 = normal_rng(temp_2030, sigma);
        }
        """, {"N": len(ys), "x": xs, "y": ys, "x_pred": x2030},
        num_chains=4, num_warmup=max(300, N_DRAWS // 2),
        num_samples=N_DRAWS, seed=0)
    beta = trace["beta"]
    p_warming = float((beta > 0).mean())
    t30 = trace["temp_2030"]
    print(f"[kilpisjarvi] trend {beta.mean():.3f} C/decade, "
          f"P(warming) = {p_warming:.3f}; 2030 mean summer "
          f"{t30.mean():.1f} C (90% CI {np.percentile(t30, 5):.1f}-"
          f"{np.percentile(t30, 95):.1f})")
    assert p_warming > 0.95          # the real record shows warming
    assert 8.0 < float(t30.mean()) < 12.0
    print("stan translations OK: 6 programs straight through the frontend")


if __name__ == "__main__":
    main()
