"""WAIC / LOO model comparison (reference model_comparison.ex).

Parity: pointwise log-likelihood per observation per posterior draw
(model_comparison.ex:19-50; vector obs expand to per-element columns);
waic = lppd - p_waic with SE (model_comparison.ex:63-86); loo defaults
to PSIS (Vehtari 2015, beyond the reference — the reference's basic IS
remains available as ``psis=False``, model_comparison.ex:99-119,270-276);
``compare`` returns a ranked table
(model_comparison.ex:127-147).

TPU-native: the pointwise matrix is one vmapped evaluation of the
pointwise-compiled log-density over all draws (the reference loops rows
on the host).
"""

import math
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from exmc_tpu.compiler import CompiledModel, compile_logp, _make_logp


def _as_flat_draws(model: CompiledModel, trace):
    """Constrained trace (chains, draws, ...) -> (chains*draws, d) flat
    unconstrained, inverting transforms + NCP (sampler.ex:362-381)."""
    names = [e.id for e in model.pm.entries]
    c, n = np.asarray(trace[names[0]]).shape[:2]

    def one(row):
        return model.unconstrain(row)

    rows = {k: jnp.asarray(trace[k]).reshape((c * n,) + np.asarray(trace[k]).shape[2:]) for k in names}
    return jax.jit(jax.vmap(lambda i: one({k: rows[k][i] for k in names})))(
        jnp.arange(c * n)
    )


def pointwise_log_likelihood(ir, trace, data=None, ncp=True):
    """(draws x obs-element) pointwise log-lik matrix + column keys
    (model_comparison.ex:19-50). Column keys are obs_id or (obs_id, idx)
    for vector observations."""
    model = ir if isinstance(ir, CompiledModel) else compile_logp(ir, ncp=ncp)
    if data is None:
        data = model.data
    pw_fn = _make_logp(model.ir, model.pm, pointwise=True)
    flat = _as_flat_draws(model, trace)
    out = jax.jit(jax.vmap(lambda f: pw_fn(f, data)))(flat)

    cols, keys = [], []
    for obs_id in sorted(out):
        arr = np.asarray(out[obs_id])
        arr = arr.reshape(arr.shape[0], -1)
        for j in range(arr.shape[1]):
            cols.append(arr[:, j])
            keys.append(obs_id if arr.shape[1] == 1 else (obs_id, j))
    return np.stack(cols, axis=1), keys  # (S, n_obs)


def waic(ir, trace, data=None, ncp=True):
    """WAIC = -2(lppd - p_waic) with SE (model_comparison.ex:63-86)."""
    ll, keys = pointwise_log_likelihood(ir, trace, data=data, ncp=ncp)
    s, n = ll.shape
    lppd_i = jax.scipy.special.logsumexp(jnp.asarray(ll), axis=0) - math.log(s)
    p_waic_i = jnp.var(jnp.asarray(ll), axis=0, ddof=1)
    elpd_i = np.asarray(lppd_i - p_waic_i)
    elpd = float(elpd_i.sum())
    se = float(math.sqrt(n * np.var(elpd_i, ddof=1))) if n > 1 else 0.0
    return {
        "waic": -2.0 * elpd,
        "elpd_waic": elpd,
        "p_waic": float(np.asarray(p_waic_i).sum()),
        "se": 2.0 * se,
        "elpd_se": se,
        "pointwise": elpd_i,
    }


def _psis_smooth(log_w):
    """Pareto-smoothed importance weights for ONE observation
    (Vehtari/Simpson/Gelman 2015). log_w: (S,) raw log importance
    weights. Returns (smoothed log_w, pareto k-hat, fitted) —
    ``fitted=False`` means the GPD tail fit could not run (too few
    positive exceedances) and k-hat is a benign-flat-tail 0.0 that
    diagnostics wanting the 'did it work?' answer must treat as
    unknown, not as excellent."""
    s = log_w.shape[0]
    m = max(int(np.ceil(min(0.2 * s, 3.0 * np.sqrt(s)))), 5)
    order = np.argsort(log_w)
    tail_idx = order[-m:]
    tail = np.exp(log_w[tail_idx] - log_w.max())
    cutoff = np.exp(log_w[order[-m - 1]] - log_w.max())
    exceed = tail - cutoff
    # Zhang & Stephens (2009) profile-posterior GPD fit
    x = np.sort(exceed[exceed > 0])
    if x.size < 5:
        return log_w, 0.0, False
    n = x.size
    x_star = x[max(int(n / 4 + 0.5) - 1, 0)]
    mth = 30 + int(np.sqrt(n))
    jj = np.arange(1, mth + 1)
    thetas = 1.0 / x[-1] + (1.0 - np.sqrt(mth / (jj - 0.5))) / (3.0 * x_star)
    # loo-package convention throughout (Vehtari/Coles shape xi): for each
    # theta, k = +mean(log1p(-theta*x)) (positive = heavy tail), profile
    # loglik l = n*(log(-theta/k) - k - 1).
    ks = np.array([np.mean(np.log1p(-t * x)) for t in thetas])
    with np.errstate(divide="ignore", invalid="ignore"):
        ls = n * (np.log(-thetas / ks) - ks - 1.0)
    ls = np.where(np.isfinite(ls), ls, -np.inf)
    w = np.exp(ls - ls.max())
    w = w / w.sum()
    theta_hat = float(np.sum(thetas * w))
    k_hat = float(np.mean(np.log1p(-theta_hat * x)))
    sigma_hat = -k_hat / theta_hat if theta_hat != 0 else 0.0
    # replace tail by expected GPD order statistics
    if sigma_hat > 0 and np.isfinite(k_hat):
        probs = (np.arange(1, m + 1) - 0.5) / m
        if abs(k_hat) < 1e-6:
            quant = -sigma_hat * np.log1p(-probs)
        else:
            quant = sigma_hat / k_hat * ((1 - probs) ** (-k_hat) - 1.0)
        smoothed_tail = np.log(cutoff + quant) + log_w.max()
        new = log_w.copy()
        new[tail_idx] = np.minimum(np.sort(smoothed_tail), log_w.max())
        return new, k_hat, True
    fitted = bool(np.isfinite(k_hat))
    return log_w, k_hat if fitted else 0.0, fitted


def loo(ir, trace, data=None, ncp=True, psis=True):
    """LOO via importance sampling.

    Default ``psis=True`` is Pareto-smoothed IS (Vehtari 2015):
    per-observation tail weights are replaced by fitted GPD quantiles
    and the result carries per-observation ``pareto_k`` reliability
    diagnostics; observations with k > 0.7 trigger a warning (their
    elpd contribution is unreliable — refit or use K-fold). Pass
    ``psis=False`` for exact reference parity: basic (harmonic-mean
    style) IS with no smoothing and notoriously unbounded variance
    (model_comparison.ex:99-119,270-276)."""
    ll, keys = pointwise_log_likelihood(ir, trace, data=data, ncp=ncp)
    llj = jnp.asarray(ll)
    s, n = ll.shape
    if psis:
        elpd_list, k_list = [], []
        for j in range(n):
            log_w = -ll[:, j]
            log_w = log_w - log_w.max()
            log_w, k_hat, _ = _psis_smooth(log_w)
            lse_w = jax.scipy.special.logsumexp(jnp.asarray(log_w))
            lse_wl = jax.scipy.special.logsumexp(jnp.asarray(log_w + ll[:, j]))
            elpd_list.append(float(lse_wl - lse_w))
            k_list.append(k_hat)
        elpd_i = np.asarray(elpd_list)
        pareto_k = np.asarray(k_list)
    else:
        # elpd_loo_i = -logsumexp(-ll_i) + log S (harmonic-mean IS)
        elpd_i = np.asarray(
            -(jax.scipy.special.logsumexp(-llj, axis=0)) + math.log(s)
        )
        pareto_k = None
    elpd = float(elpd_i.sum())
    lppd_i = np.asarray(jax.scipy.special.logsumexp(llj, axis=0) - math.log(s))
    p_loo = float(lppd_i.sum() - elpd)
    se = float(math.sqrt(n * np.var(elpd_i, ddof=1))) if n > 1 else 0.0
    out = {
        "loo": -2.0 * elpd,
        "elpd_loo": elpd,
        "p_loo": p_loo,
        "se": 2.0 * se,
        "elpd_se": se,
        "pointwise": elpd_i,
    }
    if pareto_k is not None:
        out["pareto_k"] = pareto_k
        n_bad = int((pareto_k > 0.7).sum())
        if n_bad:
            warnings.warn(
                f"PSIS-LOO: {n_bad}/{n} observation(s) have Pareto "
                "k-hat > 0.7; their elpd contributions are unreliable "
                "(consider K-fold CV or refitting without them).",
                stacklevel=2,
            )
    return out


def compare(models, data=None, criterion="waic"):
    """Ranked comparison table (model_comparison.ex:127-147).

    ``models``: dict name -> (ir, trace). Returns list of row dicts sorted
    best-first with delta_elpd vs the winner."""
    fn = waic if criterion == "waic" else loo
    elpd_key = "elpd_waic" if criterion == "waic" else "elpd_loo"
    rows = []
    for name, (ir, trace) in models.items():
        res = fn(ir, trace, data=data)
        rows.append({"name": name, **res, "elpd": res[elpd_key]})
    rows.sort(key=lambda r: -r["elpd"])
    best = rows[0]["elpd"]
    best_pw = np.asarray(rows[0]["pointwise"])
    for i, r in enumerate(rows):
        r["rank"] = i
        r["delta_elpd"] = best - r["elpd"]
        # paired SE of the difference from the POINTWISE elpd diffs
        # (Vehtari 2017 workflow) — NOT the quadrature of the two
        # model SEs, which overstates uncertainty for correlated
        # pointwise errors on shared observations
        pw = np.asarray(r["pointwise"])
        if i == 0 or pw.shape != best_pw.shape:
            r["delta_elpd_se"] = 0.0
        else:
            d = best_pw - pw
            n = d.shape[0]
            r["delta_elpd_se"] = (
                float(math.sqrt(n * np.var(d, ddof=1))) if n > 1 else 0.0
            )
    return rows


def log_marginal_likelihood(ir, *, method="smc", data=None, ncp=True,
                            seed=0, **kwargs):
    """Estimate log p(y) (the model evidence) for Bayes-factor model
    comparison. Beyond the reference (model_comparison.ex is
    WAIC/LOO-only).

    ``method``:
      * ``"smc"`` — likelihood-tempering SMC telescoping estimator
        (smc.py, tempering="likelihood"): consistent, the default.
        kwargs forward to :func:`smc_sample` (num_particles, ...).
      * ``"flow"`` — the flow-VI ELBO (flows.py): a strict LOWER
        bound, tight when the fitted Pareto k is small; cheap when a
        FlowFit already exists (pass ``flow=fit``). kwargs forward to
        :func:`flow_fit`.

    Returns a dict: ``log_evidence``, ``method``, plus method detail
    (SMC: stages/betas; flow: pareto_k and the bound caveat).
    """
    if method == "smc":
        from exmc_tpu.smc import smc_sample

        _, info = smc_sample(ir, data=data, ncp=ncp, seed=seed,
                             tempering="likelihood", **kwargs)
        if not info["converged"]:
            raise RuntimeError(
                "SMC beta ladder did not reach 1.0; no evidence "
                "estimate (raise max_stages)")
        return {"log_evidence": info["log_evidence"], "method": "smc",
                "num_stages": info["num_stages"], "betas": info["betas"]}
    if method == "flow":
        from exmc_tpu.flows import flow_fit

        fit = kwargs.pop("flow", None)
        if fit is not None and kwargs:
            raise ValueError(
                "pass flow= (an existing fit) OR fit options "
                f"({sorted(kwargs)}), not both — the options would be "
                "silently ignored")
        if fit is None:
            fit = flow_fit(ir, data=data, ncp=ncp, seed=seed, **kwargs)
        elbo = float(np.mean(fit.elbo_history[-100:]))
        return {"log_evidence": elbo, "method": "flow",
                "lower_bound": True,
                "pareto_k": fit.psis_diagnostic(seed=seed + 1)}
    raise ValueError(f"method must be 'smc' or 'flow', got {method!r}")


def bayes_factor(ir_a, ir_b, *, method="smc", data=None, ncp=True, seed=0,
                 **kwargs):
    """log10 Bayes factor of model A over model B (both evidences via
    :func:`log_marginal_likelihood` with the same settings). Jeffreys'
    reading: >1 strong for A, <-1 strong for B, in between
    inconclusive."""
    za = log_marginal_likelihood(ir_a, method=method, data=data, ncp=ncp,
                                 seed=seed, **kwargs)
    zb = log_marginal_likelihood(ir_b, method=method, data=data, ncp=ncp,
                                 seed=seed, **kwargs)
    log10_bf = (za["log_evidence"] - zb["log_evidence"]) / math.log(10.0)
    return {"log10_bf": log10_bf, "evidence_a": za, "evidence_b": zb}
