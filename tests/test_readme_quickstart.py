"""The README quick-start block must actually run (the analog of the
reference's rustdoc ```no_run examples, SURVEY.md §4 — except these
execute). Scaled down for CPU CI."""

import os
import re
from pathlib import Path


def test_quickstart_executes(tmp_path, monkeypatch):
    readme = Path(__file__).resolve().parent.parent / "README.md"
    m = re.search(r"## Quick start\s+```python\n(.*?)```", readme.read_text(),
                  re.S)
    assert m, "quick-start block missing from README"
    code = m.group(1).replace("100_000", "2_000")
    monkeypatch.chdir(tmp_path)
    ns: dict = {}
    exec(compile(code, "README-quickstart", "exec"), ns)
    assert os.path.exists(tmp_path / "docs.mvt")
    assert len(ns["result"].top(0)) == 10
