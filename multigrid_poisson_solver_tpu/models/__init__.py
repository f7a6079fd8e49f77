"""Problem families (the pluggable analog of the reference's hardcoded problem module)."""

from .problems import (  # noqa: F401
    BUILTIN_PROBLEMS,
    Problem,
    REFERENCE_PROBLEM,
    gaussian_charge_problem,
    polynomial_problem,
    sine_problem,
)
