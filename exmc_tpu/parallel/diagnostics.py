"""Cross-chip diagnostics: split R-hat and ESS computed over
chain-sharded traces with XLA collectives — the ICI ride the survey
names for cross-chain reductions (SURVEY.md §2.11/5.8: "collectives
(psum/all_gather) only for cross-chain reductions (R-hat, pooled
adaptation)").

Each device reduces its local chains; one psum per moment combines
them. No draw matrix ever leaves its device."""

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from exmc_tpu.diagnostics import autocovariance, _split_chains


def sharded_rhat(draws, mesh, axis="dp"):
    """Split-chain R-hat over a (chains, n) array whose chain axis is
    sharded on ``axis``. Matches exmc_tpu.diagnostics.rhat."""

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None),), out_specs=P(),
        check_vma=False,
    )
    def compute(local):
        s = _split_chains(local)
        m_local, n = s.shape
        means = jnp.mean(s, axis=1)
        vars_ = jnp.var(s, axis=1, ddof=1)
        # psum the moments of the per-(split-)chain statistics. The
        # between-chain variance is computed CENTERED (second psum pass
        # on (means - grand)^2): the one-pass E[x^2]-E[x]^2 form
        # catastrophically cancels in f32 for posteriors with a large
        # common offset (round-5 review finding) — a mean near 1e3
        # leaves ~0.1 of f32 rounding noise against a true b of ~1e-4.
        cnt = jax.lax.psum(jnp.asarray(m_local, s.dtype), axis)
        grand = jax.lax.psum(jnp.sum(means), axis) / cnt
        b_sum = jax.lax.psum(jnp.sum((means - grand) ** 2), axis)
        w = jax.lax.psum(jnp.sum(vars_), axis) / cnt
        b = n * b_sum / (cnt - 1.0)
        var_plus = (n - 1) / n * w + b / n
        return jnp.sqrt(var_plus / jnp.maximum(w, 1e-30))

    return compute(draws)


def sharded_nested_rhat(draws, mesh, num_superchains, axis="dp"):
    """Nested R-hat (Margossian 2022) over a chain-sharded (chains, n)
    array — the many-short-chains convergence diagnostic computed with
    one psum per moment, no draw matrix leaving its device. Matches
    exmc_tpu.diagnostics.nested_rhat (consecutive superchain grouping).

    Requires each device shard to hold WHOLE superchains: with chains
    sharded over ``axis`` into n_dev equal shards of size chains/n_dev,
    chains/num_superchains must divide chains/n_dev — the natural
    layout, since superchain grouping and sharding are both consecutive.
    """
    c, n = draws.shape
    k = int(num_superchains)
    if k < 2:
        raise ValueError("need >= 2 superchains")
    if c % k != 0:
        raise ValueError(f"chains ({c}) not divisible by k ({k})")
    m = c // k
    if m < 2:
        raise ValueError("need >= 2 chains per superchain")
    n_dev = mesh.shape[axis]
    local_chains = c // n_dev
    if local_chains % m != 0:
        raise ValueError(
            f"each of the {n_dev} '{axis}' shards holds {local_chains} "
            f"chains, not a whole number of size-{m} superchains")

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None),), out_specs=P(),
        check_vma=False,
    )
    def compute(local):
        g = local.reshape(-1, m, n)                        # (k_local, m, n)
        chain_means = jnp.mean(g, axis=2)                  # (k_local, m)
        within_chain = (
            jnp.var(g, axis=2, ddof=1).mean(axis=1) if n > 1
            else jnp.zeros((g.shape[0],), local.dtype)
        )                                                  # (k_local,)
        super_means = jnp.mean(chain_means, axis=1)        # (k_local,)
        cnt = jax.lax.psum(
            jnp.asarray(g.shape[0], local.dtype), axis)    # total k
        # centered two-pass between-variance (see sharded_rhat: the
        # one-pass form cancels catastrophically in f32 for offset
        # posteriors)
        grand = jax.lax.psum(jnp.sum(super_means), axis) / cnt
        b_sum = jax.lax.psum(jnp.sum((super_means - grand) ** 2), axis)
        b = b_sum / (cnt - 1.0)
        w_terms = jnp.var(chain_means, axis=1, ddof=1) + within_chain
        w = jax.lax.psum(jnp.sum(w_terms), axis) / cnt
        return jnp.sqrt(1.0 + b / jnp.maximum(w, 1e-30))

    return compute(draws)


def sharded_ess(draws, mesh, axis="dp"):
    """Pooled-chain Geyer ESS over a sharded (chains, n) array; per-chain
    autocovariance runs locally (FFT on-device), psums pool the moments.
    Matches exmc_tpu.diagnostics.ess (Vehtari 2021: var_plus includes the
    between-chain term, ADVICE r1)."""
    from exmc_tpu.diagnostics import _geyer_tau

    c_total = draws.shape[0]

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None),), out_specs=P(),
        check_vma=False,
    )
    def compute(local):
        c_local, n = local.shape
        acov = autocovariance(local)
        cnt = jnp.asarray(float(c_total), local.dtype)
        mean_acov = jax.lax.psum(jnp.sum(acov, axis=0), axis) / cnt
        w_biased = mean_acov[0]
        mean_var = w_biased * n / (n - 1.0)
        chain_means = jnp.mean(local, axis=1)
        var_plus = w_biased
        if c_total > 1:
            # centered two-pass between-variance (see sharded_rhat)
            grand = jax.lax.psum(jnp.sum(chain_means), axis) / cnt
            b_sum = jax.lax.psum(
                jnp.sum((chain_means - grand) ** 2), axis)
            var_plus = var_plus + b_sum / (cnt - 1.0)
        rho = 1.0 - (mean_var - mean_acov) / jnp.maximum(var_plus, 1e-30)
        rho = rho.at[0].set(1.0)
        n_pairs = n // 2
        pair = rho[0 : 2 * n_pairs : 2] + rho[1 : 2 * n_pairs : 2]
        tau = _geyer_tau(pair, n)
        return cnt * n / tau

    return compute(draws)
