"""Parity suite runs with FutureWarning promoted to an error so a JAX
upgrade that turns a deprecation (e.g. unsafe scatter dtype casts under
``jax.enable_x64``) into a hard failure is caught here first, not as 125
red tests after the upgrade."""

import warnings

import pytest


@pytest.fixture(autouse=True)
def _future_warnings_are_errors():
    with warnings.catch_warnings():
        warnings.simplefilter("error", FutureWarning)
        yield
