"""Executable documentation: every ```python fence in the README, docs, and
tutorials runs top-to-bottom (cumulative namespace per file) — the rebuild's
analog of the reference's strict doctest CI job (reference CI.yml:55-60,
docs/make.jl:13-20). Tutorials train real models and are marked slow."""
import pathlib
import re

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]

_FENCE = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _snippets(relpath):
    text = (ROOT / relpath).read_text()
    return _FENCE.findall(text)


def _run_file(relpath):
    ns = {}
    for i, block in enumerate(_snippets(relpath)):
        try:
            exec(compile(block, f"{relpath}[block {i + 1}]", "exec"), ns)
        except Exception as exc:  # pragma: no cover - failure reporting
            raise AssertionError(
                f"doc snippet {relpath} block {i + 1} failed: {exc!r}\n"
                f"---\n{block}") from exc


@pytest.mark.parametrize("relpath", [
    "README.md",
    "docs/index.md",
    "docs/custom_layers.md",
])
def test_doc_snippets_run(relpath):
    assert _snippets(relpath), f"no python snippets found in {relpath}"
    _run_file(relpath)


@pytest.mark.slow
@pytest.mark.parametrize("relpath", [
    "docs/tutorials/neural_graph_ode.md",
    "docs/tutorials/vmh_convection_diffusion.md",
])
def test_tutorial_snippets_run(relpath):
    assert _snippets(relpath), f"no python snippets found in {relpath}"
    _run_file(relpath)
