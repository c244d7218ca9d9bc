from .linreg import CRAMER3, linear_fit_exact, suffstats_int  # noqa: F401
