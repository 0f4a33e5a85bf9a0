"""Application-layer tests (reference poker/physics demo coverage)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from exmc_tpu.apps import physics
from exmc_tpu.apps.poker import cards
from exmc_tpu.apps import poker as _  # noqa
import exmc_tpu.apps.poker as poker


# ---- physics ----

def test_heat2d_uniform_kappa_linear_profile():
    """Uniform conductivity -> steady state is the linear BC interpolation."""
    t = physics.heat2d_solve(jnp.ones((16, 16)), iterations=500)
    frac = np.arange(16) / 15.0
    expected = 1.0 * (1 - frac)  # bc_top=1, bc_bottom=0
    np.testing.assert_allclose(np.asarray(t[:, 8]), expected, atol=0.01)


def test_heat2d_differentiable():
    def loss(kappa):
        t = physics.heat2d_solve(kappa, iterations=20)
        return jnp.sum(physics.read_sensors(t, [(8, 8)]))

    g = jax.grad(loss)(jnp.ones((12, 12)) * 1.5)
    assert np.isfinite(np.asarray(g)).all()


def test_smooth_heaviside():
    h = physics.smooth_heaviside(jnp.asarray([-10.0, 0.0, 10.0]), eps=1.0)
    np.testing.assert_allclose(np.asarray(h), [0.0, 0.5, 1.0], atol=1e-4)


def test_material_field():
    kappa = physics.material_field(jnp.asarray([-10.0, 10.0]), 2.0, 0.5)
    np.testing.assert_allclose(np.asarray(kappa), [0.5, 2.0], atol=1e-3)


def test_level_set_inverse_model_compiles():
    from exmc_tpu.compiler import compile_logp

    ny = nx = 6

    def forward(phi):
        kappa = physics.material_field(phi, 2.0, 0.5)
        t = physics.heat2d_solve(kappa, iterations=10)
        return physics.read_sensors(t, "bottom_row")

    data = np.zeros(nx, np.float32)
    ir = physics.build_inverse_model(forward, data, ny=ny, nx=nx)
    m = compile_logp(ir)
    assert m.size == ny * nx
    v, g = m.value_and_grad(jnp.zeros(ny * nx), jnp.asarray(data))
    assert np.isfinite(float(v))
    assert np.isfinite(np.asarray(g)).all()


# ---- poker ----

def test_cards_parse_and_names():
    assert cards.card_name(cards.parse("Ah")) == "Ah"
    assert cards.rank(cards.parse("2c")) == 0
    assert len(cards.deck()) == 52


def test_hand_evaluation_ordering():
    flush = [cards.parse(c) for c in ["Ah", "Kh", "Qh", "Jh", "9h"]]
    straight = [cards.parse(c) for c in ["9c", "8d", "7h", "6s", "5c"]]
    pair = [cards.parse(c) for c in ["Ac", "Ad", "7h", "6s", "5c"]]
    assert cards.evaluate_5(flush) > cards.evaluate_5(straight) > cards.evaluate_5(pair)


def test_hand_strength_monotone():
    aa = [cards.parse("Ah"), cards.parse("Ad")]
    trash = [cards.parse("7h"), cards.parse("2d")]
    s_aa = cards.hand_strength(aa, [], samples=300)
    s_tr = cards.hand_strength(trash, [], samples=300)
    assert s_aa > 0.7 > s_tr


def test_poker_profile_recovers_types():
    """Profile 2 contrasting archetypes from 80 hands each; posterior
    vpip ordering should match truth (poker.ex quickstart flow)."""
    players = [poker.archetypes()[2], poker.archetypes()[4]]  # nit, maniac
    obs, truth = poker.simulate(players, hands=80, seed=1)
    profiles, stats = poker.profile(obs, num_samples=200, num_warmup=300,
                                    seed=42)
    nit_vpip = float(np.mean(profiles[0]["vpip"]))
    maniac_vpip = float(np.mean(profiles[1]["vpip"]))
    assert nit_vpip < maniac_vpip
    table = poker.compare(truth, profiles)
    assert table[0]["player"] == "nit"


def test_poker_decide():
    prof = {
        "vpip": np.full(50, 0.2),
        "pfr": np.full(50, 0.15),
        "agg": np.full(50, 1.5),
        "bluff": np.full(50, 0.2),
    }
    d = poker.decide(["Ah", "Kh"], ["Td", "Jd", "2c"], prof, pot=100,
                     to_call=30)
    assert d["recommended"] in ("fold", "call", "raise")
    assert 0.0 <= d["equity"] <= 1.0


def test_poker_multitable_concurrent_profiling():
    """VERDICT r1 task 10: many tables profile in ONE batched NUTS
    program (the OTP concurrent-table parity, poker.ex:24-29)."""
    from exmc_tpu.apps.poker import MultiTable

    mt = MultiTable(num_tables=3, seed=0).play(hands=60)
    profiles, stats = mt.profile_all(num_warmup=300, num_samples=200, seed=1)
    assert len(profiles) == 3
    assert all(len(p) == 3 for p in profiles)
    import numpy as np

    # tight player (nit, index 2) should profile looser-than-nit vpip
    # for the lag (index 1) at every table
    for table_profiles in profiles:
        lag_vpip = float(np.mean(table_profiles[1]["vpip"]))
        nit_vpip = float(np.mean(table_profiles[2]["vpip"]))
        assert lag_vpip > nit_vpip
