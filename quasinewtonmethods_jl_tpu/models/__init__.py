"""Model zoo: analytic log-density fixtures mirroring the reference's test
strategy (test/runtests.jl:4-33) plus the BASELINE.md benchmark configs."""

from .funnel import FUNNEL_V_STD, funnel_logdensity
from .hierarchical import HierarchicalRegression
from .logistic import LogisticRegressionMAP
from .mixture import GaussianMixture
from .poisson import PoissonRegressionMAP
from .quadratic import IllConditionedQuadratic, quadratic_logdensity
from .statespace import AR1DriftMAP
from .rosenbrock import Rosenbrock, rosenbrock_logdensity, rosenbrock_value_and_grad

__all__ = [
    "AR1DriftMAP",
    "FUNNEL_V_STD",
    "funnel_logdensity",
    "HierarchicalRegression",
    "LogisticRegressionMAP",
    "GaussianMixture",
    "PoissonRegressionMAP",
    "IllConditionedQuadratic",
    "quadratic_logdensity",
    "Rosenbrock",
    "rosenbrock_logdensity",
    "rosenbrock_value_and_grad",
]
