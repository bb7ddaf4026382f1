"""The committed walkthrough notebooks (docs/notebooks/, the TPU-native
equivalents of reference docs/notebooks/{generation,inference_census}.ipynb)
must stay parseable, executed, and error-free. Re-executing them in CI would
cost minutes per run, so this pins the committed artifacts instead; re-run
them after API changes with:

    python - <<'PY'
    import nbformat; from nbclient import NotebookClient
    for p in ("docs/notebooks/generation.ipynb",
              "docs/notebooks/inference_census.ipynb"):
        nb = nbformat.read(p, as_version=4)
        NotebookClient(nb, timeout=560).execute(); nbformat.write(nb, p)
    PY
"""

from pathlib import Path

import pytest

nbformat = pytest.importorskip("nbformat")

NOTEBOOKS = sorted(
    (Path(__file__).parent.parent / "docs" / "notebooks").glob("*.ipynb")
)


def test_notebooks_exist():
    names = {p.name for p in NOTEBOOKS}
    assert {"generation.ipynb", "inference_census.ipynb"} <= names


@pytest.mark.parametrize("path", NOTEBOOKS, ids=lambda p: p.name)
def test_notebook_executed_without_errors(path):
    nb = nbformat.read(path, as_version=4)
    nbformat.validate(nb)
    code_cells = [c for c in nb.cells if c.cell_type == "code"]
    assert code_cells, "no code cells"
    for c in code_cells:
        assert c.get("execution_count"), "cell was never executed"
        for o in c.get("outputs", []):
            assert o.get("output_type") != "error", (
                f"{path.name} committed with an error output: "
                f"{o.get('ename')}: {o.get('evalue')}"
            )
