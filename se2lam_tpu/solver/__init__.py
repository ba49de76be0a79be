from .ba import BAConfig, BAProblem, ba_chi2, mark_outliers, solve_local_ba  # noqa: F401
