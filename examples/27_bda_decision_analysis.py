"""BDA3 ch. 9 — Bayesian decision analysis: the jar of coins (reference
notebooks/bda/ch09_decision_analysis.livemd; BDA3 §9.1).

Belief about the number of coins in a jar: N(160, 40). You win your
guess's value if you guess exactly right. Posteriors are not
decisions: the utility-maximizing guess is NOT the posterior mode.

  * mode guess: 160 (most probable single value)
  * expected-utility guess: argmax_g g * P(N = g) ≈ 170 — you accept a
    slightly less probable guess because winning it pays more. The
    closed-form optimum of g * phi(g) is (mu + sqrt(mu^2 + 4 s^2))/2.

Then the asymmetric-utility generalization: if overguessing voids the
prize (utility = g * 1{N >= g}), the optimum swings BELOW the mode.
All expectations are exact sums over the discretized belief, computed
in one vectorized pass.
"""

import os

import numpy as np

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

MU, SD = 160.0, 40.0


def belief_pmf(lo=1, hi=400):
    ns = np.arange(lo, hi + 1)
    z = (ns - MU) / SD
    p = np.exp(-0.5 * z * z)
    return ns, p / p.sum()


def main():
    ns, p = belief_pmf()

    mode_guess = int(ns[np.argmax(p)])

    eu_exact_win = ns * p                       # utility = guess if exact
    eu_guess = int(ns[np.argmax(eu_exact_win)])
    closed_form = 0.5 * (MU + np.sqrt(MU * MU + 4 * SD * SD))

    # asymmetric: win g coins only if the jar holds AT LEAST g
    p_at_least = p[::-1].cumsum()[::-1]
    eu_floor = ns * p_at_least
    floor_guess = int(ns[np.argmax(eu_floor)])

    print(f"belief: N({MU:.0f}, {SD:.0f}) over coin counts")
    print(f"[mode          ] guess {mode_guess}")
    print(f"[exact-win EU  ] guess {eu_guess} "
          f"(closed form {closed_form:.1f}) — ABOVE the mode: a bigger "
          "prize is worth a slightly less probable guess")
    print(f"[at-least EU   ] guess {floor_guess} — far BELOW the mode: "
          "overguessing voids the prize, so hedge down")
    assert mode_guess == 160
    assert abs(eu_guess - closed_form) <= 1.0
    assert floor_guess < mode_guess < eu_guess
    print("decision analysis OK: three utilities, three different "
          "optimal actions from ONE posterior")


if __name__ == "__main__":
    main()
