"""Section-bounded SCALING.md writer shared by the scaling studies.

Round-8 postmortem: each study's writer used to truncate from its own
header to EOF, so re-running the sf~1 study silently deleted the sf~5
section that had been appended after it (commit 16c92bc clobbered
f244164's 50x results). This helper rewrites ONLY the slice between the
study's own `## ` header and the next `## ` header (or EOF), preserving
everything before and after. tests/test_docs.py pins the known section
headers so a regression here fails the suite instead of eating a study.
"""

from __future__ import annotations


def replace_section(path: str, header: str, body_lines: list[str]) -> None:
    """Replace (or append) the section starting at `header` in `path`,
    touching nothing outside [header, next '## ' heading)."""
    with open(path) as f:
        text = f.read()
    section = "\n".join([header] + body_lines).rstrip() + "\n"
    if header in text:
        start = text.index(header)
        nxt = text.find("\n## ", start + len(header))
        tail = "" if nxt == -1 else text[nxt + 1:]
        text = text[:start].rstrip() + "\n\n" + section
        if tail:
            text += "\n" + tail
    else:
        text = text.rstrip() + "\n\n" + section
    with open(path, "w") as f:
        f.write(text)
