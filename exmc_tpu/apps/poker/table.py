"""Table session manager (reference poker/table.ex — the OTP
"player-per-GenServer" mode, poker.ex:24-29).

The BEAM version supervises one process per player; here a Table is a
plain stateful session accumulating hand histories per player and
re-profiling on demand — concurrency lives inside the vmapped sampler,
not in the session object."""

import numpy as np

from exmc_tpu.apps.poker import api, simulator
from exmc_tpu.apps.poker.action_model import sample_action


class Table:
    def __init__(self, player_params=None, seed=0):
        self.players = player_params or simulator.archetypes()
        self.rng = np.random.default_rng(seed)
        self.observations = [
            {"hand_strengths": [], "actions": []} for _ in self.players
        ]

    def play(self, hands=50):
        """Deal ``hands`` rounds; every player acts from their true
        params (table.ex play)."""
        for _ in range(hands):
            for i, params in enumerate(self.players):
                hs = float(self.rng.random())
                act = sample_action(
                    self.rng, params["vpip"], params["pfr"], params["agg"],
                    params["bluff"], hs,
                )
                self.observations[i]["hand_strengths"].append(hs)
                self.observations[i]["actions"].append(act)
        return self

    def profile(self, **opts):
        """Bayesian profile of every seated player from accumulated
        history (table.ex profile)."""
        return api.profile(self.observations, **opts)

    def hand_counts(self):
        return [len(o["actions"]) for o in self.observations]
