"""The distribution library (parity with reference lib/exmc/dist/'s 21,
plus general-bounds Uniform)."""

from exmc_tpu.dists.base import Distribution, get, register, all_dists
from exmc_tpu.dists.continuous import (
    NORMAL as Normal,
    FLAT as Flat,
    HALF_NORMAL as HalfNormal,
    EXPONENTIAL as Exponential,
    GAMMA as Gamma,
    BETA as Beta,
    UNIFORM01 as Uniform01,
    UNIFORM as Uniform,
    STUDENT_T as StudentT,
    CAUCHY as Cauchy,
    HALF_CAUCHY as HalfCauchy,
    LOGNORMAL as LogNormal,
    LAPLACE as Laplace,
    TRUNCATED_NORMAL as TruncatedNormal,
    WEIBULL as Weibull,
)
from exmc_tpu.dists.discrete import (
    BERNOULLI as Bernoulli,
    POISSON as Poisson,
    BINOMIAL as Binomial,
    NEGATIVE_BINOMIAL as NegativeBinomial,
    CATEGORICAL as Categorical,
)
from exmc_tpu.dists.multivariate import (
    MV_NORMAL as MvNormal,
    DIRICHLET as Dirichlet,
    LKJ_CHOLESKY as LKJCholesky,
    MULTINOMIAL as Multinomial,
    ZERO_SUM_NORMAL as ZeroSumNormal,
)
from exmc_tpu.dists.timeseries import GAUSSIAN_RANDOM_WALK as GaussianRandomWalk
from exmc_tpu.dists.composite import MIXTURE as Mixture, CENSORED as Censored, Custom

__all__ = [
    "Distribution",
    "get",
    "register",
    "all_dists",
    "Normal",
    "Flat",
    "HalfNormal",
    "Exponential",
    "Gamma",
    "Beta",
    "Uniform01",
    "Uniform",
    "StudentT",
    "Cauchy",
    "HalfCauchy",
    "LogNormal",
    "Laplace",
    "TruncatedNormal",
    "Weibull",
    "Bernoulli",
    "Binomial",
    "NegativeBinomial",
    "Categorical",
    "Poisson",
    "MvNormal",
    "Dirichlet",
    "LKJCholesky",
    "Multinomial",
    "ZeroSumNormal",
    "GaussianRandomWalk",
    "Mixture",
    "Censored",
    "Custom",
]
