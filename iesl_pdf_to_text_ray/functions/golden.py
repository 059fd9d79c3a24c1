"""Parser for the reference golden span files (tspan-texts.txt).

Format (verified, SURVEY.md §5.1): strict line pairs — line 2k is the text of
span k, line 2k+1 is blank.  Reference corpus:
/root/reference/src/test/resources/output/<doc>.pdf.expected/tspan-texts.txt
"""

from __future__ import annotations


def parse_golden_spans(path: str) -> list[str]:
    with open(path, "rb") as f:
        raw = f.read().decode("utf-8")
    lines = raw.split("\n")
    # strip single trailing empty line from the final newline
    if lines and lines[-1] == "":
        lines.pop()
    spans: list[str] = []
    for i in range(0, len(lines), 2):
        spans.append(lines[i])
        if i + 1 < len(lines) and lines[i + 1] != "":
            raise ValueError(f"{path}: line {i + 2} expected blank, got {lines[i + 1]!r}")
    return spans
