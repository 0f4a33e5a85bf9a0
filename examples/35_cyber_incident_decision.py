"""BDA-cyber ch. 9 — Incident-response decision analysis (reference
notebooks/bda-cyber/ch09_incident_response.livemd; the security edition
of ch. 9's jar of coins).

A high-severity alert fires at 2 AM. Three independent evidence
sources update the 0.2% breach base rate; then the decision: contain
now (wake the team, $50K) or wait for morning ($0 if false alarm, $2M
if real). The posterior is not the decision — the COST ASYMMETRY is:
the contain threshold sits near p = 2.5%, fifty times below "more
likely than not".
"""

import os

import numpy as np

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

PRIOR = 0.002
SOURCES = [  # (name, TPR, FPR)
    ("SIEM alert", 0.92, 0.08),
    ("EDR anomaly", 0.85, 0.03),
    ("TI IP match", 0.70, 0.01),
]
COST_CONTAIN = 50_000.0       # either world: caught early / false positive
COST_WAIT_BREACH = 2_000_000.0
COST_WAIT_FALSE = 0.0


def update(p, tpr, fpr):
    return tpr * p / (tpr * p + fpr * (1 - p))


def expected_costs(p):
    contain = COST_CONTAIN
    wait = p * COST_WAIT_BREACH + (1 - p) * COST_WAIT_FALSE
    return contain, wait


def main():
    p = PRIOR
    print(f"prior P(breach) = {p:.4f}")
    for name, tpr, fpr in SOURCES:
        p = update(p, tpr, fpr)
        print(f"  + {name:<12} (TPR {tpr:.2f}, FPR {fpr:.2f}) "
              f"-> P = {p:.4f}")
    contain, wait = expected_costs(p)
    act = "CONTAIN" if contain < wait else "WAIT"
    print(f"E[cost | contain] = ${contain:,.0f}; "
          f"E[cost | wait] = ${wait:,.0f} -> {act}")

    p_star = COST_CONTAIN / COST_WAIT_BREACH
    print(f"break-even P(breach) = {p_star:.4f} — containment is right "
          "at 2.5% belief, 20x the base rate but far below certainty: "
          "the cost asymmetry, not the posterior mode, makes the call")

    # the full decision surface: which SINGLE source suffices?
    for name, tpr, fpr in SOURCES:
        p1 = update(PRIOR, tpr, fpr)
        c, w = expected_costs(p1)
        print(f"  {name} alone -> P {p1:.4f}: "
              f"{'contain' if c < w else 'wait'}")
    assert p > 0.6           # three corroborating sources: near-certain
    assert act == "CONTAIN"
    assert update(PRIOR, *SOURCES[0][1:]) < p_star  # SIEM alone: wait
    print("incident decision OK")


if __name__ == "__main__":
    main()
