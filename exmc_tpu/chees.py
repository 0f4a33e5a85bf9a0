"""ChEES-HMC: adaptive-trajectory-length HMC for many vmapped chains.

Hoffman, Radul & Sountsov, "An Adaptive MCMC Scheme for Setting
Trajectory Lengths in Hamiltonian Monte Carlo" (AISTATS 2021) — the
sampler TFP ships as its accelerator default. This has NO reference
counterpart (the reference is single/multi-process NUTS only,
nuts/sampler.ex) — it exists because it is the natively TPU-shaped
transition: every chain runs the SAME jittered number of leapfrog steps
per iteration, so a thousand vmapped chains stay in perfect lockstep on
the MXU instead of paying NUTS's per-chain variable tree depth (under
vmap all chains wait for the deepest tree; here the integration loop
sits ABOVE the chain batch, one `lax.while_loop` per iteration with a
batched leapfrog body).

Cross-chain machinery, per the paper:

* trajectory length T adapted by Adam on the ChEES criterion gradient
  d/dlogT (1/4)E[(||q'-E q'||^2 - ||q-E q||^2)^2], estimated from the
  chain batch via the endpoint-velocity identity dq'/dt = v'
  (accept-prob-weighted, halton-jittered);
* step size by dual averaging (shared nuts/step_size.py machinery) on
  the HARMONIC-mean cross-chain accept prob (paper §3: the harmonic
  mean punishes stragglers, mean accept alone lets a few chains stall);
* diagonal metric by pooled cross-chain Welford over the same 3-phase
  window schedule as NUTS (nuts/warmup.py; pooling = Chan merge across
  the batch, the TPU-native trick from welford_merge_across).

Jitter: one shared van-der-Corput (base-2 Halton) number per iteration
scales the trajectory, t_i = u_i * T — required both for ergodicity at
fixed T and to decorrelate the ChEES gradient estimates.

API mirrors sample(): ``sample_chees(ir, num_chains=..., ...)`` returns
(trace, stats) with constrained draws shaped (chains, samples, ...).
"""

import numpy as np
import jax
import jax.numpy as jnp

from exmc_tpu.compiler import CompiledModel, compile_logp
from exmc_tpu.config import default_dtype
from exmc_tpu.engines_common import KernelCache, postprocess_ensemble
from exmc_tpu.nuts.leapfrog import (
    Metric,
    kinetic_energy,
    leapfrog,
    sample_momentum,
    velocity,
)
from exmc_tpu.nuts.mass_matrix import (
    WelfordState,
    welford_finalize,
    welford_init,
    welford_update,
)
from exmc_tpu.nuts.step_size import (
    da_finalize,
    da_init,
    da_update,
    find_reasonable_epsilon,
)
from exmc_tpu.nuts.warmup import build_schedule

# Adam hyperparameters for the log-trajectory-length update (paper
# Algorithm 1 uses Adam with a small constant learning rate).
ADAM_LR = 0.025
ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-8


def _halton_base2(n):
    """First n van-der-Corput base-2 numbers in (0, 1), u_i = bitrev(i+1).

    Precomputed host-side (the iteration count is static), consumed as a
    scan input. 30 bits of reversal is plenty for <2^30 iterations."""
    i = np.arange(1, n + 1, dtype=np.uint64)
    u = np.zeros(n, dtype=np.float64)
    f = 0.5
    while i.any():
        u += f * (i & 1)
        i >>= 1
        f *= 0.5
    return u


def _merge_welford_batch(state: WelfordState) -> WelfordState:
    """Chan-merge a batch of per-chain Welford states (leading chain
    axis) into one pooled state — welford_merge_across's psum logic with
    plain batch reductions (the chain axis here is a scan-carry batch
    dimension, not a vmap axis name)."""
    n_tot = jnp.sum(state.n)
    safe = jnp.maximum(n_tot, 1.0)
    mean_tot = jnp.sum(state.n[:, None] * state.mean, axis=0) / safe
    delta = state.mean - mean_tot[None, :]
    corr = state.n[:, None] * delta * delta
    m2_tot = jnp.sum(state.m2 + corr, axis=0)
    return WelfordState(n=n_tot, mean=mean_tot, m2=m2_tot)


def _chees_grad(q0, q1, v1, accept, tlen):
    """Accept-weighted ChEES gradient estimate wrt log T.

    Per chain m: Delta_m = ||q1-mean(q1)||^2 - ||q0-mean(q0)||^2 and
    d||q1-mean||^2/dt = 2 <q1-mean, v1>; with t = u*T the log-T chain
    rule contributes a factor t. The 1/4 criterion scale folds into
    Adam's normalization.

    The centering means are accept-prob-WEIGHTED with non-finite
    endpoints masked out (TFP does the same): one diverged chain's
    inf/huge q1 must not corrupt the mean — and hence the gradient —
    for every other chain that iteration. Weighted centering also
    keeps the accept-weighted estimator consistent (the mean-velocity
    cross-term cancels under the same weights)."""
    finite = (jnp.isfinite(q1).all(axis=-1)
              & jnp.isfinite(v1).all(axis=-1)
              & jnp.isfinite(accept))
    w = jnp.where(finite, accept, 0.0)
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    q1z = jnp.where(finite[:, None], q1, 0.0)
    v1z = jnp.where(finite[:, None], v1, 0.0)
    m1 = jnp.sum(w[:, None] * q1z, axis=0) / wsum
    m0 = jnp.sum(w[:, None] * q0, axis=0) / wsum
    c0 = q0 - m0[None, :]
    c1 = q1z - m1[None, :]
    delta = jnp.sum(c1 * c1, axis=-1) - jnp.sum(c0 * c0, axis=-1)
    dirn = jnp.sum(c1 * v1z, axis=-1)
    per_chain = delta * dirn * tlen
    g = jnp.sum(w * per_chain) / wsum
    # normalize by the criterion magnitude so Adam sees an O(1) signal
    # regardless of posterior scale (TFP does the same)
    scale = jnp.sum(w * jnp.abs(delta)) / wsum
    return g / jnp.maximum(scale, 1e-10)


def _harmonic_accept(accept):
    """Harmonic-mean cross-chain accept probability (paper §3).
    Non-finite accepts (diverged trajectories) count as ~0."""
    a = jnp.where(jnp.isfinite(accept), accept, 0.0)
    a = jnp.clip(a, 1e-10, 1.0)
    return accept.shape[0] / jnp.sum(1.0 / a)


def _snaper_grad(q0, q1, v1, accept, tlen, pc, inv):
    """Accept-weighted SNAPER criterion gradient wrt log T (Sountsov &
    Hoffman 2022): ChEES's squared-norm change is replaced by the
    squared PROJECTION onto the estimated principal component of the
    PRECONDITIONED posterior — maximizing ESS along the slowest
    direction instead of the isotropic average, which is what matters
    on anisotropic/correlated targets where the diag metric cannot
    whiten. Same masking/weighting discipline as _chees_grad."""
    s = jnp.sqrt(inv)
    finite = (jnp.isfinite(q1).all(axis=-1)
              & jnp.isfinite(v1).all(axis=-1)
              & jnp.isfinite(accept))
    w = jnp.where(finite, accept, 0.0)
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    q1z = jnp.where(finite[:, None], q1, 0.0)
    v1z = jnp.where(finite[:, None], v1, 0.0)
    m1 = jnp.sum(w[:, None] * q1z, axis=0) / wsum
    m0 = jnp.sum(w[:, None] * q0, axis=0) / wsum
    # preconditioned projections: dynamics (and hence the trajectory
    # length being tuned) live in y = q / sqrt(inv) space
    a0 = ((q0 - m0[None, :]) / s[None, :]) @ pc
    a1 = ((q1z - m1[None, :]) / s[None, :]) @ pc
    dv = (v1z / s[None, :]) @ pc
    delta = a1 * a1 - a0 * a0
    dirn = a1 * dv  # (1/2) d(a1^2)/dt; the 2 folds into normalization
    per_chain = delta * dirn * tlen
    g = jnp.sum(w * per_chain) / wsum
    scale = jnp.sum(w * jnp.abs(delta)) / wsum
    return g / jnp.maximum(scale, 1e-10)


def _oja_update(pc, q, inv, enabled, t):
    """Damped power-iteration update of the principal-component
    estimate from the current chain batch, in preconditioned
    coordinates. g = mean_m[z (z . pc)] is one application of the
    empirical covariance to pc (two matvecs, no d x d matrix); the
    iterate is blended with a decaying weight and renormalized. Sign
    is stable (pc . Sigma pc >= 0), divergent/disabled chains are
    masked out exactly like the Welford metric update."""
    s = jnp.sqrt(inv)
    w = enabled.astype(q.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    mean_q = jnp.sum(w[:, None] * q, axis=0) / wsum
    z = jnp.where(enabled[:, None], (q - mean_q[None, :]) / s[None, :], 0.0)
    g = (z.T @ (z @ pc)) / wsum
    gn = jnp.sqrt(jnp.sum(g * g))
    g_hat = jnp.where(gn > 1e-12, g / jnp.maximum(gn, 1e-12), pc)
    beta = (t + 9.0) ** -0.75
    new = (1.0 - beta) * pc + beta * g_hat
    new = new / jnp.sqrt(jnp.maximum(jnp.sum(new * new), 1e-12))
    # a fully-masked iteration (all chains diverged / adaptation off)
    # must leave the estimate untouched
    return jnp.where(jnp.sum(w) > 0.5, new, pc)


def sample_chees(ir, *, num_chains=64, num_warmup=500, num_samples=1000,
                 seed=0, init=None, data=None, ncp=True,
                 target_accept=0.651, max_num_steps=1024, mesh=None,
                 return_unconstrained=False, criterion="chees"):
    """Many-chain ChEES-HMC. Returns (trace, stats) like sample().

    ``target_accept`` defaults to the paper's 0.651 (optimal for HMC
    with long trajectories, not NUTS's 0.8). ``max_num_steps`` caps the
    per-iteration leapfrog count (guards the early-warmup regime where
    eps is tiny and T still large).

    ``mesh``: a jax Mesh with a "dp" axis — the chain batch shards
    across it (GSPMD: the init arrays are placed with
    ``P("dp")`` and XLA propagates the sharding through the scan,
    turning the cross-chain reductions — ChEES-criterion means,
    harmonic accept, pooled-Welford merge — into ICI collectives).
    Every chain still runs the same leapfrog count per iteration, so
    the lockstep property survives sharding: this is the multichip
    many-chain path (cf. parallel.sample_chains_sharded for NUTS).

    stats: accept_prob/logp/energy/diverging are (chains, samples);
    step_size, trajectory_length, inv_mass, num_steps_mean are the
    frozen post-warmup tuning.
    """
    if criterion not in ("chees", "snaper"):
        raise ValueError(f"unknown criterion {criterion!r} (chees|snaper)")
    if num_chains < 2:
        raise ValueError("ChEES adaptation needs >= 2 chains for the "
                         "cross-chain criterion (use sample() for 1)")
    model = ir if isinstance(ir, CompiledModel) else compile_logp(ir, ncp=ncp)
    if data is None:
        data = model.data if isinstance(ir, CompiledModel) else ir.data
    d = model.size
    if d == 0:
        return {}, {"note": "model has no free parameters"}
    dtype = default_dtype()

    model, run = _cached_kernel(
        ir, model, ncp, num_chains, num_warmup, num_samples,
        target_accept, max_num_steps, criterion)

    base = jax.random.PRNGKey(seed)
    eps_key = jax.random.fold_in(base, 424_243)

    init_keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.fold_in(base, 10_000_019), jnp.arange(num_chains))
    if init is not None:
        flat0 = model.unconstrain(init).astype(dtype)
        q_inits = jnp.broadcast_to(flat0, (num_chains, d))
    else:
        q_inits = None

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = mesh.shape["dp"]
        if num_chains % dp != 0:
            raise ValueError(
                f"num_chains={num_chains} not divisible by dp={dp}")
        chain_sharded = NamedSharding(mesh, P("dp"))
        init_keys = jax.device_put(init_keys, chain_sharded)
        if q_inits is not None:
            q_inits = jax.device_put(q_inits, chain_sharded)

    outs, tuning = run(q_inits, init_keys, data, eps_key)

    extra = {
        "step_size": np.asarray(tuning["step_size"]),
        "trajectory_length": np.asarray(tuning["trajectory_length"]),
        "inv_mass": np.asarray(tuning["inv_mass"]),
        "num_steps_mean": float(np.asarray(outs["num_steps"]).mean()),
    }
    if criterion == "snaper":
        extra["principal_component"] = np.asarray(
            tuning["principal_component"])
    return postprocess_ensemble(
        outs, model, data, num_chains, num_samples, return_unconstrained,
        extra_stats=extra)


def sample_snaper(ir, **kwargs):
    """SNAPER-HMC (Sountsov & Hoffman, "Focusing on Difficult Directions
    for Learning HMC Trajectory Lengths", 2022): the ChEES kernel with
    the trajectory-length criterion projected onto an online estimate of
    the posterior's principal component in PRECONDITIONED space (damped
    power iteration over the chain batch — two matvecs per warmup
    iteration, no d x d covariance).

    Same lockstep many-chain TPU shape as ChEES; wins when the diag
    metric cannot whiten the target (correlated posteriors): ChEES's
    isotropic squared-norm criterion is dominated by the fast
    directions and under-lengthens trajectories, SNAPER tunes against
    the slowest direction directly. Accepts every ``sample_chees``
    keyword; stats additionally carry the learned
    ``principal_component``. No reference counterpart (reference is
    NUTS-only, nuts/sampler.ex)."""
    if kwargs.pop("criterion", "snaper") != "snaper":
        raise ValueError("sample_snaper is the criterion='snaper' entry "
                         "point; call sample_chees for criterion='chees'")
    return sample_chees(ir, criterion="snaper", **kwargs)


_KERNEL_CACHE = KernelCache()


def clear_kernel_cache():
    _KERNEL_CACHE.clear()


def _cached_kernel(ir, model, ncp, num_chains, num_warmup, num_samples,
                   target_accept, max_num_steps, criterion="chees"):
    key = (KernelCache.model_sig(ir, ncp), num_chains, num_warmup,
           num_samples, float(target_accept), int(max_num_steps),
           criterion)
    return _KERNEL_CACHE.get_or_build(
        key, model,
        lambda: _build_kernel(model, num_chains, num_warmup, num_samples,
                              target_accept, max_num_steps,
                              criterion=criterion))


def _build_kernel(model, num_chains, num_warmup, num_samples,
                  target_accept, max_num_steps, criterion="chees"):
    """Build the traceable ChEES kernel:
    ``run(q_inits, init_keys, data, eps_key) -> (outs, tuning)``.

    Pure (no jit inside) so callers compose it: ``sample_chees`` jits
    it (via _cached_kernel); ``sbc(engine="chees")`` vmaps it over
    replications, each with its own synthetic dataset riding the
    ``data`` argument (the data-as-JIT-argument channel, D69/D-T27).

    Two scans: the warmup scan carries adaptation state and emits NO
    per-iteration outputs (at 1024 chains x large d, materializing
    warmup draws just to slice them off costs ~warmup/samples extra
    peak HBM); the sampling scan runs the frozen transition and emits
    the draws. ``outs`` arrays are therefore post-warmup only,
    (num_samples, chains, ...)."""
    d = model.size
    dtype = default_dtype()
    vag = model.value_and_grad
    total = num_warmup + num_samples
    schedule = build_schedule(num_warmup, max_depth=10)
    halton = _halton_base2(total)
    xs_warm = {
        "u": jnp.asarray(halton[:num_warmup], dtype),
        "update_mass": jnp.asarray(schedule.update_mass),
        "window_end": jnp.asarray(schedule.window_end),
        "i": jnp.arange(num_warmup),
    }
    xs_samp = {
        "u": jnp.asarray(halton[num_warmup:], dtype),
        "i": jnp.arange(num_warmup, total),
    }

    def run(q_inits, init_keys, data, eps_key):
        def vag_fn(q):
            return vag(q, data)

        from exmc_tpu.nuts.sampler import _find_valid_init

        if q_inits is None:
            q0, logp0, grad0, keys = jax.vmap(
                lambda k: _find_valid_init(vag_fn, k, d, dtype))(init_keys)
        else:
            q0, logp0, grad0, keys = jax.vmap(
                lambda k, qi: _find_valid_init(vag_fn, k, d, dtype, qi)
            )(init_keys, q_inits)

        inv0 = jnp.ones((d,), dtype)
        metric0 = Metric(inv=inv0, chol_inv=jnp.sqrt(inv0))
        eps0 = find_reasonable_epsilon(
            vag_fn, q0[0], logp0[0], grad0[0], eps_key, metric0)
        da0 = da_init(eps0)
        # start T at one reasonable-eps trajectory of ~8 steps
        logT0 = jnp.log(8.0 * eps0)

        carry = dict(
            q=q0, logp=logp0, grad=grad0, keys=keys,
            da=da0, logT=logT0, logT_bar=logT0,
            adam_m=jnp.zeros((), dtype), adam_v=jnp.zeros((), dtype),
            adam_t=jnp.zeros((), dtype),
            inv=inv0,
            wf=jax.vmap(lambda _: welford_init(d, dtype=dtype))(
                jnp.arange(num_chains)),
        )
        if criterion == "snaper":
            carry["pc"] = jnp.full((d,), 1.0 / np.sqrt(d), dtype)

        def transition(carry, x, eps, T):
            """One jittered-trajectory HMC move for the whole batch."""
            metric = Metric(inv=carry["inv"], chol_inv=jnp.sqrt(carry["inv"]))
            tlen = x["u"] * T
            L = jnp.clip(jnp.ceil(tlen / eps).astype(jnp.int32),
                         1, max_num_steps)
            tlen = L.astype(dtype) * eps  # the length actually integrated

            keys = jax.vmap(
                lambda k: jax.random.fold_in(k, x["i"]))(carry["keys"])
            mom_keys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
            acc_keys = jax.vmap(lambda k: jax.random.fold_in(k, 2))(keys)

            p0 = jax.vmap(lambda k: sample_momentum(k, metric, d))(mom_keys)
            ke0 = jax.vmap(lambda p: kinetic_energy(metric, p))(p0)
            joint0 = carry["logp"] - ke0

            lf = jax.vmap(
                lambda q, p, g: leapfrog(vag_fn, q, p, g, eps, metric))

            def lf_cond(s):
                return s[0] < L

            def lf_body(s):
                i, q, p, logp, grad = s
                q, p, logp, grad = lf(q, p, grad)
                return i + 1, q, p, logp, grad

            _, q1, p1, logp1, grad1 = jax.lax.while_loop(
                lf_cond, lf_body,
                (jnp.zeros((), jnp.int32), carry["q"], p0,
                 carry["logp"], carry["grad"]))

            ke1 = jax.vmap(lambda p: kinetic_energy(metric, p))(p1)
            joint1 = logp1 - ke1
            delta = joint1 - joint0
            # reject non-finite gradients even when the energy is
            # finite: grad is only refreshed on accept, and an accepted
            # NaN grad poisons every later trajectory start (same
            # review finding as meads.py)
            grad_ok = jnp.all(jnp.isfinite(grad1), axis=-1)
            delta = jnp.where(jnp.isfinite(delta) & grad_ok,
                              delta, -jnp.inf)
            accept_prob = jnp.exp(jnp.minimum(delta, 0.0))
            diverging = delta < -1000.0

            un = jax.vmap(lambda k: jax.random.uniform(k))(acc_keys)
            take = un < accept_prob
            q_new = jnp.where(take[:, None], q1, carry["q"])
            logp_new = jnp.where(take, logp1, carry["logp"])
            grad_new = jnp.where(take[:, None], grad1, carry["grad"])
            energy = -jnp.where(take, joint1, joint0)

            move = dict(q=q_new, logp=logp_new, grad=grad_new,
                        accept_prob=accept_prob, diverging=diverging,
                        energy=energy, num_steps=L, metric=metric,
                        q1=q1, p1=p1, tlen=tlen)
            return move

        def warm_step(carry, x):
            eps = jnp.exp(carry["da"].log_eps)
            T = jnp.exp(carry["logT"])
            mv = transition(carry, x, eps, T)

            # --- trajectory-length adaptation ---
            v1 = jax.vmap(lambda p: velocity(mv["metric"], p))(mv["p1"])
            if criterion == "snaper":
                g = _snaper_grad(carry["q"], mv["q1"], v1,
                                 mv["accept_prob"], mv["tlen"],
                                 carry["pc"], carry["inv"])
            else:
                g = _chees_grad(carry["q"], mv["q1"], v1,
                                mv["accept_prob"], mv["tlen"])
            t_adam = carry["adam_t"] + 1.0
            m = ADAM_B1 * carry["adam_m"] + (1 - ADAM_B1) * g
            v = ADAM_B2 * carry["adam_v"] + (1 - ADAM_B2) * g * g
            m_hat = m / (1 - ADAM_B1 ** t_adam)
            v_hat = v / (1 - ADAM_B2 ** t_adam)
            logT = carry["logT"] + ADAM_LR * m_hat / (
                jnp.sqrt(v_hat) + ADAM_EPS)
            logT = jnp.clip(
                logT, jnp.log(eps), jnp.log(eps * (max_num_steps - 1)))
            eta = (t_adam + 10.0) ** -0.75  # DA-style iterate averaging
            logT_bar = eta * logT + (1 - eta) * carry["logT_bar"]

            # --- step-size adaptation ---
            da = da_update(carry["da"], _harmonic_accept(mv["accept_prob"]),
                           target_accept)

            # --- pooled metric adaptation at window ends ---
            wf = jax.vmap(
                lambda s, qq, en: welford_update(s, qq, enabled=en)
            )(carry["wf"], mv["q"], jnp.broadcast_to(
                x["update_mass"], (num_chains,)) & ~mv["diverging"])
            pooled = _merge_welford_batch(wf)
            inv_f = welford_finalize(pooled, carry["inv"])
            inv = jnp.where(x["window_end"], inv_f, carry["inv"])
            wf = jax.tree_util.tree_map(
                lambda fresh, cur: jnp.where(x["window_end"], fresh, cur),
                jax.vmap(lambda _: welford_init(d, dtype=dtype))(
                    jnp.arange(num_chains)),
                wf)

            new_carry = dict(
                q=mv["q"], logp=mv["logp"], grad=mv["grad"],
                keys=carry["keys"], da=da, logT=logT, logT_bar=logT_bar,
                adam_m=m, adam_v=v, adam_t=t_adam, inv=inv, wf=wf,
            )
            if criterion == "snaper":
                enabled = (jnp.broadcast_to(x["update_mass"], (num_chains,))
                           & ~mv["diverging"])
                new_carry["pc"] = _oja_update(
                    carry["pc"], mv["q"], carry["inv"], enabled,
                    x["i"].astype(dtype))
            return new_carry, None

        def samp_step(carry, x):
            eps = da_finalize(carry["da"])
            T = jnp.exp(carry["logT_bar"])
            mv = transition(carry, x, eps, T)
            new_carry = dict(carry, q=mv["q"], logp=mv["logp"],
                             grad=mv["grad"])
            out = dict(q=mv["q"], logp=mv["logp"],
                       accept_prob=mv["accept_prob"],
                       diverging=mv["diverging"], energy=mv["energy"],
                       num_steps=mv["num_steps"])
            return new_carry, out

        carry, _ = jax.lax.scan(warm_step, carry, xs_warm)
        carry, outs = jax.lax.scan(samp_step, carry, xs_samp)
        tuning = dict(step_size=da_finalize(carry["da"]),
                      trajectory_length=jnp.exp(carry["logT_bar"]),
                      inv_mass=carry["inv"])
        if criterion == "snaper":
            tuning["principal_component"] = carry["pc"]
        return outs, tuning

    return run
