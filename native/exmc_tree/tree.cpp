// Host-side recursive multinomial NUTS tree builder.
//
// Role (cf. reference native/exmc_tree/src/{tree,types,uturn,lib}.rs):
// the reference needed this on the hot path — its Elixir tree paid
// ~200us per merge, so subtree/full-tree building moved to a Rust NIF.
// On TPU the hot path is the iterative lax.while_loop kernel
// (exmc_tpu/nuts/tree.py); this C++ builder exists as
//   (a) a structurally-independent ORACLE: recursive formulation, same
//       semantics (uncapped multinomial weights, delta<-1000 divergence,
//       balanced inner / biased-progressive outer merges, generalized
//       rho U-turn + Stan's two extended sub-trajectory checks) — the
//       statistical cross-check that catches merge-protocol bugs the
//       reference says cost it 2-3x ESS (DECISIONS D49/D50/D46);
//   (b) a host fallback for driving trees from precomputed leapfrog
//       states (the same precomputed-states contract as the reference
//       NIF, types.rs:40-107).
//
// Fresh implementation; no code derives from the reference.
//
// Build: g++ -O2 -shared -fPIC -o libexmc_tree.so tree.cpp

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// xorshift128+ PRNG (public-domain algorithm)
struct Rng {
  uint64_t s0, s1;
  explicit Rng(uint64_t seed) {
    // splitmix64 init
    uint64_t z = seed + 0x9E3779B97F4A7C15ull;
    auto mix = [&z]() {
      z += 0x9E3779B97F4A7C15ull;
      uint64_t t = z;
      t = (t ^ (t >> 30)) * 0xBF58476D1CE4E5B9ull;
      t = (t ^ (t >> 27)) * 0x94D049BB133111EBull;
      return t ^ (t >> 31);
    };
    s0 = mix();
    s1 = mix();
  }
  uint64_t next() {
    uint64_t x = s0, y = s1;
    s0 = y;
    x ^= x << 23;
    s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s1 + y;
  }
  double uniform() {  // (0, 1)
    return ((next() >> 11) + 0.5) * (1.0 / 9007199254740992.0);
  }
  double log_uniform() { return std::log(uniform()); }
  bool coin() { return (next() & 1ull) != 0; }
};

double logaddexp(double a, double b) {
  if (a == -INFINITY) return b;
  if (b == -INFINITY) return a;
  double m = a > b ? a : b;
  return m + std::log(std::exp(a - m) + std::exp(b - m));
}

// Precomputed bidirectional leapfrog chain.
// Signed step index t: t > 0 -> forward chain row t-1; t < 0 -> backward
// chain row -t-1; t == 0 -> the initial point.
struct States {
  const double *q0, *p0;            // initial point, [d]
  double logp0;
  const double *qf, *pf, *lf;       // forward chain, [n_fwd][d] / [n_fwd]
  const double *qb, *pb, *lb;       // backward chain
  int n_fwd, n_bwd, d;
  const double *inv_mass;           // diag, [d]

  const double* q(int t) const {
    if (t == 0) return q0;
    return t > 0 ? qf + (size_t)(t - 1) * d : qb + (size_t)(-t - 1) * d;
  }
  const double* p(int t) const {
    if (t == 0) return p0;
    return t > 0 ? pf + (size_t)(t - 1) * d : pb + (size_t)(-t - 1) * d;
  }
  double logp(int t) const {
    if (t == 0) return logp0;
    return t > 0 ? lf[t - 1] : lb[-t - 1];
  }
  double kinetic(int t) const {
    const double* pp = p(t);
    double k = 0.0;
    for (int i = 0; i < d; ++i) k += pp[i] * inv_mass[i] * pp[i];
    return 0.5 * k;
  }
  double joint(int t) const { return logp(t) - kinetic(t); }
};

// U-turn: trajectory persists only while rho . v(p_boundary) > 0 at both
// boundaries (generalized criterion; reference uturn.rs:8-30 semantics).
bool is_turning(const States& st, const std::vector<double>& rho, int t_minus,
                int t_plus) {
  const double *pm = st.p(t_minus), *pp = st.p(t_plus);
  double dm = 0.0, dp = 0.0;
  for (int i = 0; i < st.d; ++i) {
    dm += rho[i] * st.inv_mass[i] * pm[i];
    dp += rho[i] * st.inv_mass[i] * pp[i];
  }
  return dm <= 0.0 || dp <= 0.0;
}

struct Subtree {
  int t_near = 0, t_far = 0;    // boundary step indices (near = closest to start)
  int t_prop = 0;               // selected proposal leaf
  double lsw = -INFINITY;       // multinomial log-sum-weight
  std::vector<double> rho;      // momentum sum over leaves
  double sum_accept = 0.0;
  int n_leaf = 0;
  bool turning = false, diverging = false;
};

struct Ctx {
  const States* st;
  Rng* rng;
  double joint0;
  double divergence_threshold;
};

void add_p(const States& st, std::vector<double>& rho, int t) {
  const double* pp = st.p(t);
  for (int i = 0; i < st.d; ++i) rho[i] += pp[i];
}

// Recursively build a subtree of 2^depth leaves, starting at signed step
// index `next` and extending by `dir` (+1/-1) per leaf.
Subtree build_subtree(Ctx& ctx, int depth, int next, int dir) {
  const States& st = *ctx.st;
  Subtree out;
  out.rho.assign(st.d, 0.0);
  if (depth == 0) {
    double delta = st.joint(next) - ctx.joint0;
    bool div = !(delta >= -ctx.divergence_threshold);  // NaN-safe
    out.t_near = out.t_far = out.t_prop = next;
    out.lsw = div ? -INFINITY : delta;  // uncapped weight (D49)
    if (!div) add_p(st, out.rho, next);
    out.sum_accept = div ? 0.0 : std::exp(std::min(delta, 0.0));
    out.n_leaf = 1;
    out.diverging = div;
    return out;
  }
  Subtree first = build_subtree(ctx, depth - 1, next, dir);
  if (first.turning || first.diverging) return first;
  Subtree second =
      build_subtree(ctx, depth - 1, first.t_far + dir, dir);
  // merge (balanced multinomial, inner merge)
  Subtree m;
  m.rho = first.rho;
  for (int i = 0; i < st.d; ++i) m.rho[i] += second.rho[i];
  m.lsw = logaddexp(first.lsw, second.lsw);
  bool take_second =
      !second.diverging &&
      ctx.rng->log_uniform() < second.lsw - m.lsw;  // balanced
  m.t_prop = take_second ? second.t_prop : first.t_prop;
  m.t_near = first.t_near;
  m.t_far = second.t_far;
  m.sum_accept = first.sum_accept + second.sum_accept;
  m.n_leaf = first.n_leaf + second.n_leaf;
  m.diverging = second.diverging;
  if (!m.diverging && !second.turning) {
    // full-subtree U-turn + the two extended sub-trajectory checks
    // (Stan nuts.hpp semantics; reference tree.ex:1424-1449, D46)
    bool turn = is_turning(st, m.rho, m.t_near, m.t_far);
    std::vector<double> rho_ext = first.rho;
    add_p(st, rho_ext, second.t_near);
    turn = turn || is_turning(st, rho_ext, first.t_near, second.t_near);
    rho_ext = second.rho;
    add_p(st, rho_ext, first.t_far);
    turn = turn || is_turning(st, rho_ext, first.t_far, second.t_far);
    m.turning = turn;
  } else {
    m.turning = second.turning;
  }
  return m;
}

}  // namespace

// Shared implementation; `forced_dirs` (optional, length >= max_depth,
// entries +1/-1) pins each doubling's direction instead of drawing it
// from the PRNG — the matched-RNG lockstep hook: tree SHAPE (depth,
// leapfrog count, divergence, mean accept) is a deterministic function
// of geometry + directions, so forcing the directions to the XLA
// kernel's own draws makes shape comparable EXACTLY per trial (the
// remaining PRNG consumption only picks which leaf is proposed).
static int build_full_tree_impl(
    const double* q0, const double* p0, double logp0,
    const double* q_fwd, const double* p_fwd, const double* logp_fwd,
    int n_fwd,
    const double* q_bwd, const double* p_bwd, const double* logp_bwd,
    int n_bwd,
    int d, const double* inv_mass_diag, int max_depth,
    double divergence_threshold, uint64_t seed, const int* forced_dirs,
    int* out_selected, int* out_depth, int* out_n_leapfrog,
    int* out_diverging, double* out_accept) {
  States st{q0, p0, logp0, q_fwd, p_fwd, logp_fwd,
            q_bwd, p_bwd, logp_bwd, n_fwd, n_bwd, d, inv_mass_diag};
  Rng rng(seed);
  Ctx ctx{&st, &rng, st.joint(0), divergence_threshold};

  // trajectory state
  int t_left = 0, t_right = 0, t_prop = 0;
  std::vector<double> rho(d, 0.0);
  add_p(st, rho, 0);
  double lsw = 0.0;  // initial point weight exp(0)
  double sum_accept = 0.0;
  int n_leaf = 0, depth = 0;
  bool diverging = false;

  while (depth < max_depth) {
    int dir = forced_dirs ? forced_dirs[depth] : (rng.coin() ? 1 : -1);
    int start = (dir > 0 ? t_right : t_left) + dir;
    int need = 1 << depth;
    // bounds check against precomputed budget
    int end = start + dir * (need - 1);
    if (end > n_fwd || -end > n_bwd) return -1;

    Subtree sub = build_subtree(ctx, depth, start, dir);
    sum_accept += sub.sum_accept;
    n_leaf += sub.n_leaf;
    bool ok = !sub.turning && !sub.diverging;
    if (ok) {
      // biased progressive outer merge (D50)
      if (rng.log_uniform() < sub.lsw - lsw) t_prop = sub.t_prop;
      lsw = logaddexp(lsw, sub.lsw);
      int old_left = t_left, old_right = t_right;
      std::vector<double> rho_old = rho;
      if (dir > 0) t_right = sub.t_far; else t_left = sub.t_far;
      for (int i = 0; i < d; ++i) rho[i] += sub.rho[i];
      // full + two extended checks at the outer merge (D43/D46)
      bool turn = is_turning(st, rho, t_left, t_right);
      int far_old = dir > 0 ? old_left : old_right;
      int adj_old = dir > 0 ? old_right : old_left;
      std::vector<double> rho_ext = rho_old;
      add_p(st, rho_ext, sub.t_near);
      turn = turn || is_turning(st, rho_ext, far_old, sub.t_near);
      rho_ext = sub.rho;
      add_p(st, rho_ext, adj_old);
      turn = turn || is_turning(st, rho_ext, adj_old, sub.t_far);
      depth += 1;
      if (turn) break;
    } else {
      diverging = sub.diverging;
      depth += 1;
      break;
    }
  }

  *out_selected = t_prop;
  *out_depth = depth;
  *out_n_leapfrog = n_leaf;
  *out_diverging = diverging ? 1 : 0;
  *out_accept = n_leaf > 0 ? sum_accept / n_leaf : 0.0;
  return 0;
}

extern "C" {

// Build a full NUTS tree from precomputed bidirectional leapfrog chains.
// Outputs: selected signed step index, depth reached, leapfrog count,
// diverging flag, mean accept prob. Returns 0 on success, -1 if the
// precomputed chains were exhausted before natural termination.
int exmc_build_full_tree(
    const double* q0, const double* p0, double logp0,
    const double* q_fwd, const double* p_fwd, const double* logp_fwd,
    int n_fwd,
    const double* q_bwd, const double* p_bwd, const double* logp_bwd,
    int n_bwd,
    int d, const double* inv_mass_diag, int max_depth,
    double divergence_threshold, uint64_t seed,
    int* out_selected, int* out_depth, int* out_n_leapfrog,
    int* out_diverging, double* out_accept) {
  return build_full_tree_impl(
      q0, p0, logp0, q_fwd, p_fwd, logp_fwd, n_fwd,
      q_bwd, p_bwd, logp_bwd, n_bwd, d, inv_mass_diag, max_depth,
      divergence_threshold, seed, nullptr,
      out_selected, out_depth, out_n_leapfrog, out_diverging, out_accept);
}

// Same, with each doubling's direction forced from `dirs` (+1/-1,
// length >= max_depth) — the matched-RNG lockstep entry point.
int exmc_build_full_tree_dirs(
    const double* q0, const double* p0, double logp0,
    const double* q_fwd, const double* p_fwd, const double* logp_fwd,
    int n_fwd,
    const double* q_bwd, const double* p_bwd, const double* logp_bwd,
    int n_bwd,
    int d, const double* inv_mass_diag, int max_depth,
    double divergence_threshold, uint64_t seed, const int* dirs,
    int* out_selected, int* out_depth, int* out_n_leapfrog,
    int* out_diverging, double* out_accept) {
  return build_full_tree_impl(
      q0, p0, logp0, q_fwd, p_fwd, logp_fwd, n_fwd,
      q_bwd, p_bwd, logp_bwd, n_bwd, d, inv_mass_diag, max_depth,
      divergence_threshold, seed, dirs,
      out_selected, out_depth, out_n_leapfrog, out_diverging, out_accept);
}

}  // extern "C"
