"""NUTS internals: leapfrog energy conservation, dual averaging,
Welford, epsilon search, warmup schedule (reference nuts_test.exs
coverage, SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from exmc_tpu.nuts.leapfrog import (
    Metric,
    kinetic_energy,
    leapfrog,
    make_metric,
    sample_momentum,
)
from exmc_tpu.nuts.mass_matrix import welford_finalize, welford_init, welford_update
from exmc_tpu.nuts.step_size import (
    da_finalize,
    da_init,
    da_update,
    find_reasonable_epsilon,
)
from exmc_tpu.nuts.tree import nuts_transition, _is_turning
from exmc_tpu.nuts.warmup import build_schedule


def gaussian_vag(q):
    return -0.5 * jnp.sum(q * q), -q


def test_leapfrog_energy_conservation():
    """100 small steps on a standard Gaussian conserve the joint
    (reference nuts_test.exs:36-50)."""
    metric = make_metric(jnp.ones(3))
    q = jnp.asarray([0.5, -0.3, 1.0])
    p = jnp.asarray([0.2, 0.7, -0.4])
    logp, grad = gaussian_vag(q)
    joint0 = logp - kinetic_energy(metric, p)
    eps = 0.01
    for _ in range(100):
        q, p, logp, grad = leapfrog(gaussian_vag, q, p, grad, eps, metric)
    joint1 = logp - kinetic_energy(metric, p)
    assert abs(float(joint1 - joint0)) < 1e-3


def test_leapfrog_reversibility():
    metric = make_metric(jnp.ones(2))
    q0 = jnp.asarray([0.5, -0.3])
    p0 = jnp.asarray([0.2, 0.7])
    logp, grad = gaussian_vag(q0)
    q1, p1, logp1, grad1 = leapfrog(gaussian_vag, q0, p0, grad, 0.1, metric)
    q2, p2, _, _ = leapfrog(gaussian_vag, q1, -p1, grad1, 0.1, metric)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(-p2), np.asarray(p0), atol=1e-5)


def test_dense_metric_momentum_covariance():
    inv = jnp.asarray([[2.0, 0.5], [0.5, 1.0]])
    metric = make_metric(inv)
    keys = jax.random.split(jax.random.PRNGKey(0), 20000)
    ps = jax.vmap(lambda k: sample_momentum(k, metric, 2))(keys)
    emp_cov = np.cov(np.asarray(ps).T)
    mass = np.linalg.inv(np.asarray(inv))
    np.testing.assert_allclose(emp_cov, mass, atol=0.05)


def test_dual_averaging_converges_to_target():
    """DA drives a synthetic accept-prob model to the target
    (reference nuts_test.exs DA convergence)."""
    da = da_init(jnp.asarray(1.0))
    # synthetic: accept_prob = exp(-eps) (monotone decreasing in eps)
    for _ in range(500):
        eps = jnp.exp(da.log_eps)
        accept = jnp.exp(-eps)
        da = da_update(da, accept, 0.8)
    eps_final = float(da_finalize(da))
    # accept(eps*) = 0.8 -> eps* = -log(0.8) = 0.223
    assert abs(eps_final - 0.223) < 0.05


def test_da_init_from_epsilon():
    da = da_init(jnp.asarray(0.37))
    assert abs(float(jnp.exp(da.log_eps_bar)) - 0.37) < 1e-4


def test_welford_diag():
    rng = np.random.default_rng(0)
    xs = rng.normal(size=(500, 3)) * np.array([1.0, 2.0, 0.5])
    st = welford_init(3)
    for x in xs:
        st = welford_update(st, jnp.asarray(x, jnp.float32))
    var = welford_finalize(st, jnp.ones(3))
    expected = xs.var(axis=0, ddof=1)
    n = 500
    shrunk = (n / (n + 5.0)) * expected + (5.0 / (n + 5.0)) * 1e-3
    np.testing.assert_allclose(np.asarray(var), shrunk, rtol=0.01)


def test_welford_disabled_update_is_noop():
    st = welford_init(2)
    st1 = welford_update(st, jnp.asarray([1.0, 2.0]), enabled=False)
    assert float(st1.n) == 0.0


def test_welford_dense():
    rng = np.random.default_rng(1)
    a = np.array([[1.0, 0.6], [0.0, 0.8]])
    xs = rng.normal(size=(2000, 2)) @ a.T
    st = welford_init(2, dense=True)
    for x in xs[:500]:
        st = welford_update(st, jnp.asarray(x, jnp.float32))
    cov = np.asarray(welford_finalize(st, jnp.eye(2)))
    expected = np.cov(xs[:500].T)
    np.testing.assert_allclose(cov, expected, atol=0.1)


def test_find_reasonable_epsilon():
    metric = make_metric(jnp.ones(2))
    q = jnp.zeros(2)
    logp, grad = gaussian_vag(q)
    eps = find_reasonable_epsilon(
        gaussian_vag, q, logp, grad, jax.random.PRNGKey(0), metric
    )
    # for a standard Gaussian a reasonable step size is O(1)
    assert 0.05 < float(eps) < 4.0


def test_uturn_criterion():
    metric = make_metric(jnp.ones(2))
    # momenta pointing along rho: not turning
    rho = jnp.asarray([1.0, 0.0])
    assert not bool(_is_turning(metric, rho, rho, 2 * rho))
    # boundary momentum anti-aligned: turning
    assert bool(_is_turning(metric, -rho, rho, jnp.asarray([0.5, 0.0])))


def test_warmup_schedule_1000():
    s = build_schedule(1000)
    assert s.update_mass.sum() == 1000 - 75 - 50
    ends = np.nonzero(s.window_end)[0]
    # windows 25,50,100,... inside [75, 950), last extended to 949
    assert ends[0] == 75 + 25 - 1
    assert ends[-1] == 949
    assert s.depth_cap[:200].max() == 8
    assert s.depth_cap[200:].min() == 10


def test_warmup_schedule_tiny():
    s = build_schedule(30)
    assert s.update_mass.sum() == 0  # too short for mass adaptation
    s2 = build_schedule(0)
    assert s2.num_warmup == 0


def test_nuts_transition_gaussian():
    """Transition on a 2-d Gaussian: finite, moves, no divergence."""
    metric = make_metric(jnp.ones(2))
    q = jnp.asarray([0.3, -0.2])
    logp, grad = gaussian_vag(q)
    q1, logp1, grad1, stats = jax.jit(
        lambda q, logp, grad, key: nuts_transition(
            gaussian_vag, metric, 0.5, q, logp, grad, key, 10
        )
    )(q, logp, grad, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(q1)).all()
    assert not bool(stats["diverging"])
    assert int(stats["n_steps"]) >= 1
    assert 0.0 <= float(stats["accept_prob"]) <= 1.0


def test_nuts_transition_statistical():
    """Statistical property test (reference statham_tree_test.exs:1-14):
    chain of transitions on a standard Gaussian has mean accept in a
    sane band, proposal diversity, and correct 2nd moment."""
    metric = make_metric(jnp.ones(2))

    def step(carry, key):
        q, logp, grad = carry
        q, logp, grad, stats = nuts_transition(
            gaussian_vag, metric, 0.4, q, logp, grad, key, 10
        )
        return (q, logp, grad), (q, stats["accept_prob"], stats["depth"])

    q = jnp.zeros(2)
    logp, grad = gaussian_vag(q)
    keys = jax.random.split(jax.random.PRNGKey(1), 1500)
    _, (qs, accepts, depths) = jax.lax.scan(step, (q, logp, grad), keys)
    qs = np.asarray(qs)[300:]
    assert 0.55 < float(np.mean(np.asarray(accepts))) <= 1.0
    # proposal diversity: nearly every draw differs from its predecessor
    moved = np.mean(np.any(np.diff(qs, axis=0) != 0, axis=1))
    assert moved > 0.9
    np.testing.assert_allclose(qs.mean(axis=0), 0.0, atol=0.15)
    np.testing.assert_allclose(qs.var(axis=0), 1.0, atol=0.2)


def test_nuts_divergence_detection():
    """A pathological density triggers the divergence flag."""

    def bad_vag(q):
        # steep cliff: huge gradients -> leapfrog blows up
        lp = -jnp.sum(jnp.exp(4.0 * q))
        return lp, jax.grad(lambda x: -jnp.sum(jnp.exp(4.0 * x)))(q)

    metric = make_metric(jnp.ones(1))
    q = jnp.asarray([2.0])
    logp, grad = bad_vag(q)
    _, _, _, stats = nuts_transition(
        bad_vag, metric, 5.0, q, logp, grad, jax.random.PRNGKey(3), 10
    )
    assert bool(stats["diverging"])


def test_search_flags_follow_windows():
    from exmc_tpu.nuts.sampler import _search_flags

    s = build_schedule(1000)
    flags = _search_flags(s, initial_search=True)
    assert flags[0]
    # a search fires exactly one iteration after each window end
    idx = np.where(s.window_end)[0]
    assert all(flags[i + 1] for i in idx if i + 1 < 1000)
    # and nowhere else (besides iteration 0)
    expected = 1 + sum(1 for i in idx if i + 1 < 1000)
    assert int(flags.sum()) == expected
    # warm-started pipelines search only after windows
    flags_ws = _search_flags(s, initial_search=False)
    assert not flags_ws[0]
    assert int(flags_ws.sum()) == expected - 1
    # degenerate schedules host no search
    assert _search_flags(build_schedule(0), True).shape == (0,)
