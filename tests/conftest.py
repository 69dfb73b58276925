"""Shared fixtures. ONE Ray session per pytest run (driver requirement)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="cdc_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
