"""Example scripts run end-to-end in smoke mode (the reference's
notebooks_test.exs keeps its livemd examples compiling)."""

import os
import runpy
import sys

import pytest

EXAMPLES = [
    "01_quickstart.py",
    "02_eight_schools.py",
    "03_stan_frontend.py",
    "04_reliability_vi.py",
    "05_physics_inversion.py",
    "06_poker.py",
    "07_radon_bhm.py",
    "08_insurance_claims.py",
    "09_state_space.py",
    "10_bayesian_spc.py",
    "11_bearing_rul.py",
    "12_model_comparison.py",
    "13_epidemic_pmcmc.py",
    "14_decline_curve.py",
    "15_warranty_batch.py",
    "16_turbine_imbalance.py",
    "17_the_batch_hierarchy.py",
    "18_turbofan_fleet.py",
    "19_trend_cycle.py",
    "20_dca_business.py",
    "21_correlated_effects.py",
    "22_bda_beta_binomial.py",
    "23_bda_normal_bioassay.py",
    "24_bda_normal_approximation.py",
    "25_bda_eight_schools.py",
    "26_bda_posterior_predictive.py",
    "27_bda_decision_analysis.py",
    "28_bda_rejection_importance.py",
    "29_bda_gibbs_metropolis.py",
    "30_cyber_ids_beta_binomial.py",
    "31_cyber_dns_baseline_bruteforce.py",
    "32_cyber_laplace_bruteforce.py",
    "33_cyber_eight_socs.py",
    "34_cyber_cve_ppc.py",
    "35_cyber_incident_decision.py",
    "36_cyber_anomaly_sampling.py",
    "37_cyber_mcmc_traffic.py",
    "38_stan_translations.py",
    "39_chees_many_chains.py",
    "40_flow_neutra_funnel.py",
    "41_gp_regression.py",
    "42_hmm_regime_switching.py",
    "43_bayesian_workflow.py",
    "44_map_laplace_psir.py",
    "45_long_series_marginalization.py",
    "46_live_streaming_monitor.py",
    "47_ar_latents_and_kalman.py",
]


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name, monkeypatch):
    monkeypatch.setenv("EXMC_EXAMPLES_SMOKE", "1")
    path = os.path.join(os.path.dirname(__file__), "..", "examples", name)
    runpy.run_path(path, run_name="__main__")
