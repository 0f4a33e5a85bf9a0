"""Normalizing-flow VI (affine-coupling RealNVP) + NeuTra-HMC.

``flow_fit`` trains a coupling flow q = f#N(0, I) on the SAME compiled
unconstrained log-density every other engine uses, maximizing the
reparameterized ELBO E_z[logp(f(z)) + logdet J_f(z)] (the base entropy
is a constant). Beyond the reference (advi.ex is mean-field only,
lib/exmc/advi.ex): a coupling flow recovers correlations and nonlinear
geometry — one affine-coupling layer expresses the funnel's
x ~ N(0, exp(y/2)) scale structure EXACTLY, which no diagonal Gaussian
can approximate.

``sample_neutra`` is NeuTra-HMC (Hoffman, Sountsov, Dillon et al.,
"NeuTra-lizing Bad Geometry in HMC using Neural Transport", 2019): run
NUTS on the pulled-back density pi(f(z)) |det J_f(z)| in z-space —
where the geometry is approximately standard normal — then push the
draws through f. This is EXACT MCMC on the exact posterior for ANY
flow quality (the flow is a change of variables, not an approximation;
a bad flow only costs mixing speed), so it composes with every NUTS
diagnostic unchanged.

TPU shape: the flow is a fixed stack of masked dense layers — batched
matmuls under vmap, no control flow; training is one ``lax.scan`` of
reparameterized-gradient Adam steps inside jit; NeuTra reuses the
whole NUTS kernel (tree.py) on a logp that is just "flow forward +
model logp", which XLA fuses.
"""

from dataclasses import dataclass
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax

from exmc_tpu.compiler import CompiledModel, compile_logp, constrain_flat
from exmc_tpu.config import default_dtype

# soft clamp on coupling log-scales: tanh-bounded to keep early
# training from exploding exp() while staying smooth (not a hard clip,
# which would zero gradients exactly where the fit is worst)
_LOGS_MAX = 4.0


def _masks(d, num_layers):
    """Alternating even/odd binary masks, (num_layers, d). For d == 1
    the conditioner input degenerates to zeros on the transforming
    layers, which makes each of them a trainable bias-only affine —
    still a valid (if plain) flow, no special-casing needed."""
    idx = np.arange(d)
    return np.stack([(idx % 2 == k % 2).astype(np.float64)
                     for k in range(num_layers)])


def init_flow(key, d, num_layers=4, hidden=32, dtype=None):
    """Flow parameters: a learned diagonal base affine (mu, log_s) plus
    ``num_layers`` affine-coupling layers, each a 1-hidden-layer tanh
    MLP conditioner emitting (shift, log_scale). The conditioner OUTPUT
    layer starts at zero, so the whole flow is exactly the identity
    composition x = mu + exp(log_s) z at init — training starts from
    mean-field ADVI's family and only then bends it."""
    dtype = dtype or default_dtype()
    keys = jax.random.split(key, num_layers)
    layers = []
    for k in range(num_layers):
        w1 = 0.1 * jax.random.normal(keys[k], (d, hidden), dtype)
        layers.append(dict(
            w1=w1, b1=jnp.zeros((hidden,), dtype),
            w2=jnp.zeros((hidden, 2 * d), dtype),
            b2=jnp.zeros((2 * d,), dtype)))
    return dict(mu=jnp.zeros((d,), dtype),
                log_s=jnp.full((d,), -1.0, dtype),
                layers=layers)


def _couple(layer, mask, x):
    """Conditioner outputs for one coupling layer from the masked part."""
    h = jnp.tanh((x * mask) @ layer["w1"] + layer["b1"])
    out = h @ layer["w2"] + layer["b2"]
    d = x.shape[-1]
    shift, logs = out[..., :d], out[..., d:]
    logs = _LOGS_MAX * jnp.tanh(logs / _LOGS_MAX)
    return shift, logs


def flow_forward(params, z):
    """z -> (x, logdet J_f(z)); base affine then coupling stack."""
    masks = _masks(z.shape[-1], len(params["layers"]))
    x = params["mu"] + jnp.exp(params["log_s"]) * z
    ld = jnp.sum(params["log_s"])
    for layer, mask in zip(params["layers"], masks):
        mask = jnp.asarray(mask, x.dtype)
        shift, logs = _couple(layer, mask, x)
        x = mask * x + (1.0 - mask) * (x * jnp.exp(logs) + shift)
        ld = ld + jnp.sum((1.0 - mask) * logs)
    return x, ld


def flow_inverse(params, x):
    """x -> (z, logdet J_{f^-1}(x)) — coupling layers invert in closed
    form (the masked half the conditioner read is untouched by the
    layer, so the conditioner re-evaluates exactly)."""
    masks = _masks(x.shape[-1], len(params["layers"]))
    ld = jnp.zeros((), x.dtype)
    for layer, mask in zip(reversed(params["layers"]), masks[::-1]):
        mask = jnp.asarray(mask, x.dtype)
        shift, logs = _couple(layer, mask, x)
        x = mask * x + (1.0 - mask) * (x - shift) * jnp.exp(-logs)
        ld = ld - jnp.sum((1.0 - mask) * logs)
    z = (x - params["mu"]) * jnp.exp(-params["log_s"])
    ld = ld - jnp.sum(params["log_s"])
    return z, ld


@dataclass
class FlowFit:
    """Trained flow bundle. ``sample`` draws a constrained trace from
    q; ``log_q`` evaluates the flow density at flat unconstrained
    points; ``psis_diagnostic`` returns the Pareto k-hat of
    importance-weighting q draws to the posterior (k < 0.7 = q is
    close enough for PSIS-corrected estimates; larger = use
    sample_neutra, which is exact regardless)."""

    model: CompiledModel
    params: Any
    elbo_history: np.ndarray
    data: Any = None

    def sample(self, num_draws=1000, seed=0, return_unconstrained=False):
        dtype = default_dtype()
        d = self.model.size
        z = jax.random.normal(jax.random.PRNGKey(seed), (num_draws, d),
                              dtype)
        x, _ = jax.jit(jax.vmap(lambda zz: flow_forward(self.params, zz)))(z)
        if return_unconstrained:
            return np.asarray(x)
        named = jax.vmap(
            lambda f: constrain_flat(self.model.ir, self.model.pm, f,
                                     self.data))(x)
        return {k: np.asarray(v)[None] for k, v in named.items()}

    def log_q(self, flat):
        z, ld = flow_inverse(self.params, jnp.asarray(flat))
        base = -0.5 * jnp.sum(z * z, axis=-1) \
            - 0.5 * z.shape[-1] * jnp.log(2.0 * jnp.pi)
        return base + ld

    def psis_diagnostic(self, num_draws=1000, seed=1):
        from exmc_tpu.model_comparison import _psis_smooth

        x = self.sample(num_draws, seed=seed, return_unconstrained=True)
        x = jnp.asarray(x)
        lp = jax.jit(jax.vmap(lambda f: self.model.logp(f, self.data)))(x)
        lq = jax.jit(jax.vmap(self.log_q))(x)
        log_w = np.asarray(lp - lq)
        log_w = log_w[np.isfinite(log_w)]
        _, k, _ = _psis_smooth(log_w)
        return float(k)


def flow_fit(ir, *, num_layers=4, hidden=32, num_iters=1500,
             num_elbo_draws=16, lr=5e-3, seed=0, data=None, ncp=True):
    """Train the coupling flow by reparameterized ELBO ascent (Adam,
    global-norm clip, non-finite-step rejection — same discipline as
    advi.py). Returns a :class:`FlowFit`.

    The ELBO estimator masks non-finite draws instead of poisoning the
    batch mean (early in training the flow can land draws outside the
    likelihood's f32 range)."""
    model = ir if isinstance(ir, CompiledModel) else compile_logp(ir, ncp=ncp)
    if data is None:
        data = model.data if isinstance(ir, CompiledModel) else ir.data
    d = model.size
    if d == 0:
        raise ValueError("model has no free parameters")
    dtype = default_dtype()

    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    params0 = init_flow(init_key, d, num_layers=num_layers, hidden=hidden,
                        dtype=dtype)
    opt = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(lr))

    # +H(base) makes the recorded ELBO the true E[logp] + H(q): for a
    # normalized logp it lower-bounds (and at a perfect fit equals) the
    # log evidence, so elbo_history is directly interpretable
    h_base = 0.5 * d * (1.0 + np.log(2.0 * np.pi))

    def neg_elbo(params, zbatch):
        x, ld = jax.vmap(lambda zz: flow_forward(params, zz))(zbatch)
        # double-where: detect bad draws on a stop-gradient probe, then
        # evaluate logp's GRADIENT path only at sanitized inputs — a
        # single post-hoc mask keeps the finite loss but 0 * NaN = NaN
        # in the backward pass rejects the whole Adam step, silently
        # stalling training (review finding, round 4). The origin (all
        # zeros) is always interior in unconstrained space.
        lp_probe = jax.vmap(lambda f: model.logp(f, data))(
            jax.lax.stop_gradient(x))
        ok = (jnp.isfinite(lp_probe)
              & jnp.all(jnp.isfinite(x), axis=-1) & jnp.isfinite(ld))
        x_safe = jnp.where(ok[:, None], x, 0.0)
        lp = jax.vmap(lambda f: model.logp(f, data))(x_safe)
        val = jnp.where(ok, lp + ld + h_base, 0.0)
        n = jnp.maximum(jnp.sum(ok), 1)
        return -jnp.sum(val) / n

    @jax.jit
    def run(params, key):
        opt_state = opt.init(params)

        def step(carry, _):
            params, opt_state, key = carry
            key, kz = jax.random.split(key)
            z = jax.random.normal(kz, (num_elbo_draws, d), dtype)
            loss, grads = jax.value_and_grad(neg_elbo)(params, z)
            updates, opt_state_new = opt.update(grads, opt_state, params)
            params_new = optax.apply_updates(params, updates)
            ok = jnp.isfinite(loss) & jax.tree_util.tree_reduce(
                lambda a, b: a & b,
                jax.tree_util.tree_map(
                    lambda t: jnp.all(jnp.isfinite(t)), params_new))
            params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), params_new, params)
            opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old),
                opt_state_new, opt_state)
            return (params, opt_state, key), -loss

        (params, _, _), elbos = jax.lax.scan(
            step, (params, opt_state, key), None, length=num_iters)
        return params, elbos

    params, elbos = run(params0, key)
    return FlowFit(model=model, params=params,
                   elbo_history=np.asarray(elbos), data=data)


def sample_neutra(ir, *, flow=None, flow_kwargs=None, data=None, ncp=True,
                  return_unconstrained=False, **sample_opts):
    """NeuTra-HMC: NUTS on the flow-pulled-back density in z-space,
    draws pushed through the flow and constrained.

    ``flow``: a :class:`FlowFit` (reuse a fit across calls — the
    transformed model is cached per FlowFit instance, so repeated
    sampling skips retracing); omitted, one is trained with
    ``flow_kwargs``. All other keywords go to :func:`exmc_tpu.sample`.

    Exactness: the pull-back is a diffeomorphic change of variables,
    so NUTS targets exactly pi(f(z))|det J| and the pushed-forward
    draws are exactly pi-distributed — flow quality affects the
    z-space geometry (mixing speed), never the answer. A perfect flow
    makes z-space N(0, I); the ncp=False centered funnel becomes
    sampleable without reparameterization (tests/test_flows.py)."""
    from exmc_tpu.nuts.sampler import sample

    if flow is None:
        flow = flow_fit(ir, data=data, ncp=ncp, **(flow_kwargs or {}))
    elif flow_kwargs:
        raise ValueError("pass flow= or flow_kwargs=, not both")
    model = flow.model
    if data is None:
        data = flow.data
    params = flow.params
    d = model.size

    cached = getattr(flow, "_neutra_model", None)
    if cached is None:
        def logp_z(z, data=None):
            x, ld = flow_forward(params, z)
            return model.logp(x, data) + ld

        def vag_z(z, data=None):
            return jax.value_and_grad(lambda zz: logp_z(zz, data))(z)

        # ncp_info={} — the z-space model has no hierarchical structure
        # for interweave/gibbs machinery to act on
        cached = CompiledModel(ir=model.ir, pm=model.pm, ncp_info={},
                               logp=logp_z, value_and_grad=vag_z, data=data)
        flow._neutra_model = cached

    zdraws, stats = sample(cached, data=data, return_unconstrained=True,
                           **sample_opts)
    if return_unconstrained:
        # still z-space here; push through the flow for x-space
        x, _ = jax.jit(jax.vmap(lambda zz: flow_forward(params, zz)))(
            jnp.asarray(zdraws.reshape(-1, d)))
        return np.asarray(x).reshape(zdraws.shape), stats

    num_chains, num_samples = zdraws.shape[0], zdraws.shape[1]
    flat_z = jnp.asarray(zdraws.reshape(-1, d))

    @jax.jit
    def push(fz):
        x, _ = jax.vmap(lambda zz: flow_forward(params, zz))(fz)
        return jax.vmap(
            lambda f: constrain_flat(model.ir, model.pm, f, data))(x)

    named = push(flat_z)
    trace = {
        k: np.asarray(v).reshape((num_chains, num_samples) + v.shape[1:])
        for k, v in named.items()
    }
    return trace, stats
