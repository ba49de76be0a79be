from .ba import BAConfig, BAProblem, ba_chi2, solve_local_ba  # noqa: F401
