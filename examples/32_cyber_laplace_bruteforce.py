"""BDA-cyber ch. 4 — Laplace approximation of the brute-force posterior
(reference notebooks/bda-cyber/ch04_laplace_bruteforce.livemd; the
security edition of ch. 4's bioassay Laplace).

The ch. 3 brute-force logistic posterior, approximated by a Gaussian at
the mode: jitted Newton (jax.grad/hessian — the notebook hand-rolls
finite differences), then the accuracy check against the exact vmapped
grid, including where the Gaussian's symmetry misleads.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

X = jnp.log(jnp.array([1.0, 3.0, 5.0, 10.0, 20.0]))
N_ACC = jnp.array([200.0, 150.0, 80.0, 40.0, 15.0])
N_BF = jnp.array([2.0, 8.0, 18.0, 25.0, 14.0])


def log_post(th):
    eta = th[0] + th[1] * X
    return jnp.sum(N_BF * eta - N_ACC * jnp.logaddexp(0.0, eta))


@jax.jit
def newton(th0, iters=30):
    def step(th, _):
        g = jax.grad(log_post)(th)
        h = jax.hessian(log_post)(th)
        return th - jnp.linalg.solve(h, g), None

    return jax.lax.scan(step, th0, None, length=iters)[0]


def main():
    mode = newton(jnp.array([-3.0, 1.0]))
    cov = jnp.linalg.inv(-jax.hessian(log_post)(mode))
    sd = jnp.sqrt(jnp.diag(cov))
    print(f"[laplace] mode alpha={mode[0]:.3f} beta={mode[1]:.3f}, "
          f"sd=({sd[0]:.3f}, {sd[1]:.3f})")

    a_g = jnp.linspace(-8.0, 0.0, 300)
    b_g = jnp.linspace(0.0, 4.0, 300)
    A, B = jnp.meshgrid(a_g, b_g, indexing="ij")
    lp = jax.vmap(jax.vmap(lambda a, b: log_post(jnp.stack([a, b]))))(A, B)
    w = jnp.exp(lp - lp.max())
    w = w / w.sum()
    mean_a, mean_b = float((w * A).sum()), float((w * B).sum())
    print(f"[grid]    exact means ({mean_a:.3f}, {mean_b:.3f})")

    # draws from the Gaussian: the tail question a SOC actually asks —
    # P(a 3-failed-login account is compromised) = sigmoid(a + b log 3)
    n = 2000 if SMOKE else 50000
    z = jax.random.normal(jax.random.PRNGKey(0), (n, 2))
    draws = mode + z @ jnp.linalg.cholesky(cov).T
    p3_laplace = jax.nn.sigmoid(draws[:, 0] + draws[:, 1] * jnp.log(3.0))
    p3_grid = jax.nn.sigmoid(A + B * jnp.log(3.0))
    print(f"[P(compromise | 3 fails)] grid {float((w * p3_grid).sum()):.4f}"
          f" vs laplace {float(p3_laplace.mean()):.4f} — close in the "
          "bulk; the approximation earns its keep at this speed")
    assert abs(float(mode[0]) - mean_a) < 0.3
    assert abs(float(p3_laplace.mean()) - float((w * p3_grid).sum())) < 0.01
    print("laplace bruteforce OK")


if __name__ == "__main__":
    main()
