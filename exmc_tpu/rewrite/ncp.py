"""Automatic non-centered parameterization (reference
non_centered_parameterization.ex).

A free RV ``x ~ Normal(mu_ref, sigma_ref)`` with BOTH params string
references becomes ``x ~ Normal(0, 1)`` and ``ir.ncp_info[x] = {"mu":
mu_ref, "sigma": sigma_ref}``. The compiler reconstructs
``mu + sigma * z`` whenever another node references ``x``
(compiler.ex:446-458); the sampler reconstructs the constrained trace in
topological order (sampler.ex:1301-1348) and inverts user inits
``z = (x - mu) / sigma`` (sampler.ex:362-381, D36).

Eliminates funnel geometry in hierarchical models — the decision worth
~10x ESS on eight_schools.
"""

from dataclasses import replace

from exmc_tpu.dists.continuous import NORMAL
from exmc_tpu.ir import IR, Node, observed_target_ids

# GRW latents at least this long also get the SPECTRAL rotation (see
# compiler._grw_spectral_basis): the sampler's coordinates become the
# exact eigenbasis of the cumsum gram, where the posterior covariance
# is ~diagonal and the standard Welford diag metric can whiten it.
# Below this length the plain diag metric already copes.
SPECTRAL_MIN_T = 64


def non_centered_parameterization(ir: IR) -> IR:
    observed = observed_target_ids(ir)
    nodes = dict(ir.nodes)
    ncp_info = dict(ir.ncp_info)
    for nid, node in ir.nodes.items():
        if node.op[0] != "rv" or nid in observed:
            continue
        # only untransformed Normal RVs whose scale is a reference
        if len(node.op) != 3:
            continue
        _, dist, params = node.op
        from exmc_tpu.dists.base import get as get_dist

        dist_name = get_dist(dist).name
        if dist_name == "gaussian_random_walk":
            # round 2: GRW NCP — s ~ GRW(sigma_ref) becomes
            # z ~ N(0,1)^T with s reconstructed as sigma * cumsum(z).
            # Exactly the state-space funnel-killer: the centered form
            # couples every latent step to the innovation scale (R-hat
            # 55 on the T=5000 SV model before this rewrite).
            sigma = params.get("sigma")
            if isinstance(sigma, str):
                nodes[nid] = Node(
                    id=nid,
                    op=("rv", NORMAL, {"mu": 0.0, "sigma": 1.0}),
                    deps=(),
                    shape=node.shape,
                    dtype=node.dtype,
                )
                t_len = node.shape[-1] if node.shape else 0
                ncp_info[nid] = {
                    "mu": 0.0, "sigma": sigma, "kind": "grw",
                    # z = V w with V the exact orthonormal eigenbasis of
                    # cumsum^T cumsum: prior stays N(0, I) (|w| = |z|),
                    # the likelihood gram becomes exactly diagonal, and
                    # Welford whitens the per-mode scales — the fix for
                    # the ~T^2-conditioned increments parameterization
                    # (measured: diag-metric NUTS at T=5000 needs
                    # eps ~ 4e-4 and mixes at ~4% efficiency)
                    "spectral": t_len >= SPECTRAL_MIN_T,
                }
            continue
        if dist_name != "normal":
            continue
        mu, sigma = params.get("mu"), params.get("sigma")
        # WIDENED vs the reference (which requires BOTH params to be RV
        # refs, non_centered_parameterization.ex:53-57): a referenced
        # scale alone already creates funnel geometry — e.g. Neal's
        # funnel x ~ N(0, exp(y/2)) with a det-node scale becomes
        # EXACTLY standard normal under z = x / scale. mu may be a
        # constant or a ref; sigma must be a ref (RV or det node).
        if isinstance(sigma, str) and (
            isinstance(mu, str) or not hasattr(mu, "__len__")
        ):
            nodes[nid] = Node(
                id=nid,
                op=("rv", NORMAL, {"mu": 0.0, "sigma": 1.0}),
                deps=(),
                shape=node.shape,
                dtype=node.dtype,
            )
            ncp_info[nid] = {"mu": mu, "sigma": sigma}
    return replace(ir, nodes=nodes, ncp_info=ncp_info)
