"""Bayesian poker opponent profiling (reference poker.ex quickstart)."""

import os

import numpy as np

from exmc_tpu.apps import poker

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"


def main():
    players = poker.archetypes()[:3]
    obs, truth = poker.simulate(players, hands=30 if SMOKE else 80, seed=0)
    profiles, stats = poker.profile(
        obs, num_samples=100 if SMOKE else 400,
        num_warmup=200 if SMOKE else 400, seed=42,
    )
    for row in poker.compare(truth, profiles):
        print(row["player"], "true", row["true"], "->", row["posterior_mean"])

    d = poker.decide(["Ah", "Kh"], ["Td", "Jd", "2c"], profiles[0],
                     pot=100, to_call=30)
    from exmc_tpu.apps.poker.decision import format_decision

    print(format_decision(d))


if __name__ == "__main__":
    main()
