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


class MultiTable:
    """Concurrent multi-table session (reference poker.ex:24-29 OTP mode,
    one GenServer per player). TPU-native concurrency: all tables'
    players profile in ONE batched NUTS program — per-table hyperparams
    are (T,) vectors and the likelihood is a single (T, P, H)
    log-softmax (opponent_model.build_batched) — instead of process-
    per-player message passing."""

    def __init__(self, table_params=None, num_tables=4, seed=0):
        from exmc_tpu.apps.poker import simulator

        if table_params is None:
            table_params = [
                simulator.archetypes()[:3] for _ in range(num_tables)
            ]
        self.tables = [
            Table(params, seed=seed + 31 * i)
            for i, params in enumerate(table_params)
        ]

    def play(self, hands=50):
        for t in self.tables:
            t.play(hands)
        return self

    def profile_all(self, **opts):
        """One vmapped NUTS run profiling every player at every table.
        Returns (list-per-table of list-per-player profiles, stats)."""
        from exmc_tpu.apps.poker import api

        return api.profile_tables(
            [t.observations for t in self.tables], **opts
        )
