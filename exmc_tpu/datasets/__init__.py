"""Bundled REAL-WORLD datasets (VERDICT r3 item 7: the validation
battery should exercise actual data end-to-end, not only
synthetic-shaped-like-real).

Provenance (all shipped as CSVs by the reference's teaching notebooks,
reference notebooks/bda/data + notebooks/bda-cyber/data; public
course/benchmark data):

* kilpisjarvi-summer-temp.csv — mean summer temperatures at the
  Kilpisjärvi (Finland) weather station 1952-2013, the Aalto BDA
  course's running linear-regression example (Vehtari et al.).
* diabetes.csv — the Pima Indians Diabetes dataset (768 patients,
  8 predictors, binary outcome), the BDA notebooks' logistic example.
* bda-cyber CSVs — small public security-domain summaries used by the
  reference's bda-cyber notebook series (AV-TEST detection rates,
  DBIR industry incident counts, DGA domain labels, IDS alert
  summaries, weekly NVD CVE counts for 2023).

NOTE on radon/kidiq: the reference's posteriordb validation used real
datasets resolved from an EXTERNAL posteriordb checkout
(benchmark/posteriordb/preprocess_posteriordb.py takes its path as
argv); neither that data nor the Gelman & Hill CSVs are shipped in the
reference repo (its radon notebook generates synthetic data,
benchmark/radon_data.exs) and this build environment has no network
egress — so the real-data gold rows here use the two real datasets
that ARE shipped.
"""

import os

import numpy as np

_DATA = os.path.join(os.path.dirname(__file__), "data")


def _path(name):
    return os.path.join(_DATA, name)


def load_kilpisjarvi():
    """Kilpisjärvi mean summer temperatures 1952-2013.

    Returns dict with ``year`` (int), ``temp_summer`` (float), plus the
    per-month columns ``temp_june/july/august``."""
    raw = np.genfromtxt(_path("kilpisjarvi-summer-temp.csv"),
                        delimiter=";", names=True, dtype=float)
    return {
        "year": raw["year"].astype(int),
        "temp_june": raw["tempjune"],
        "temp_july": raw["tempjuly"],
        "temp_august": raw["tempaugust"],
        "temp_summer": raw["tempsummer"],
    }


def load_diabetes():
    """Pima Indians Diabetes dataset: X (768, 8) float features,
    y (768,) binary outcome, and the feature names."""
    raw = np.genfromtxt(_path("diabetes.csv"), delimiter=",",
                        names=True, dtype=float)
    names = [n for n in raw.dtype.names if n != "Outcome"]
    X = np.stack([raw[n] for n in names], axis=1)
    y = raw["Outcome"].astype(np.int32)
    return {"X": X, "y": y, "feature_names": names}


def load_csv(name):
    """Raw structured-array access to any bundled CSV (bda-cyber set:
    avtest_detection, dbir_industry_incidents, dga_domains,
    ids_alert_summary, nvd_2023_cve_weekly)."""
    delim = ";" if "kilpisjarvi" in name else ","
    fname = name if name.endswith(".csv") else name + ".csv"
    return np.genfromtxt(_path(fname), delimiter=delim, names=True,
                         dtype=None, encoding="utf-8")
