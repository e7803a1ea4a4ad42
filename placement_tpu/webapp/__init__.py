"""Streamlit-independent data layer for the web app (reference L10:
web_app/). Pages under web_app/ are thin Streamlit shells over this."""

from placement_tpu.webapp.data import (RunSummary, list_runs, load_run,
                                       comparison_curves)

__all__ = ["RunSummary", "list_runs", "load_run", "comparison_curves"]
