"""Session-scoped Ray fixture — ONE ray.init per pytest session."""

from __future__ import annotations

import sys
import types
import importlib.util
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_DIR = Path("/root/reference")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def reference_extractor():
    """Load the reference's extractor module as a TEST-ONLY oracle.

    The reference module imports `elevant.models.article` and
    `elevant.settings`; stub just enough of those so the module loads
    without the reference's data directories.  Nothing from the reference
    is copied into the engine — this fixture exists purely to
    differential-test byte identity (north rule, BASELINE.json:15).
    """
    ref_file = REFERENCE_DIR / "src/elevant/helpers/wikipedia_dump_reader.py"
    if not ref_file.exists():
        pytest.skip("reference repo not available")

    saved = {k: sys.modules.get(k) for k in
             ("elevant", "elevant.models", "elevant.models.article", "elevant.settings")}
    pkg = types.ModuleType("elevant")
    models = types.ModuleType("elevant.models")
    article = types.ModuleType("elevant.models.article")
    article.ABSTRACT_INDICATOR = "ABSTRACT"
    article.Article = object
    settings = types.ModuleType("elevant.settings")
    settings.EXTRACTED_WIKIPEDIA_ARTICLES = "/nonexistent"
    pkg.models = models
    pkg.settings = settings
    sys.modules.update({
        "elevant": pkg, "elevant.models": models,
        "elevant.models.article": article, "elevant.settings": settings,
    })
    try:
        spec = importlib.util.spec_from_file_location("_ref_wdr", ref_file)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod.WikipediaDumpReader
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
