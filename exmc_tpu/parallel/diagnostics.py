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
        # psum the moments of the per-(split-)chain statistics
        cnt = jax.lax.psum(jnp.asarray(m_local, s.dtype), axis)
        sum_means = jax.lax.psum(jnp.sum(means), axis)
        sum_means2 = jax.lax.psum(jnp.sum(means**2), axis)
        w = jax.lax.psum(jnp.sum(vars_), axis) / cnt
        mean_of_means = sum_means / cnt
        b = n * (sum_means2 / cnt - mean_of_means**2) * cnt / (cnt - 1.0)
        var_plus = (n - 1) / n * w + b / n
        return jnp.sqrt(var_plus / jnp.maximum(w, 1e-30))

    return compute(draws)


def sharded_ess(draws, mesh, axis="dp"):
    """Pooled-chain Geyer ESS over a sharded (chains, n) array; per-chain
    autocovariance runs locally (FFT on-device), one psum pools."""

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None),), out_specs=P(),
        check_vma=False,
    )
    def compute(local):
        c_local, n = local.shape
        acov = autocovariance(local)
        cnt = jax.lax.psum(jnp.asarray(c_local, local.dtype), axis)
        mean_acov = jax.lax.psum(jnp.sum(acov, axis=0), axis) / cnt
        var_plus = mean_acov[0]
        rho = mean_acov / jnp.maximum(var_plus, 1e-30)
        n_pairs = n // 2
        pair = rho[0 : 2 * n_pairs : 2] + rho[1 : 2 * n_pairs : 2]
        keep = jnp.cumprod((pair > 0.0).astype(rho.dtype))
        tau = -1.0 + 2.0 * jnp.sum(pair * keep)
        tau = jnp.maximum(tau, 1.0 / jnp.log10(jnp.asarray(float(n))))
        return cnt * n / tau

    return compute(draws)
