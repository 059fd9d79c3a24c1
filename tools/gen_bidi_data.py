"""Generate the bidi character-class tables (JSON) from public data.

The two tables are Unicode bidirectional-category data (UAX #9 / UCD):
classes for U+0000-U+00FF and for the Arabic block U+0600-U+06FF, as the
reference bundle's bidi module snapshots them (pdf.combined.js:1697-1745;
the snapshot predates current Unicode — e.g. U+0600-0605 are AL there but
AN in modern UCD — and the engine reproduces the snapshot for parity).
Writes iesl_pdf_to_text_ray/pdf/data/bidi_types.json.
"""

from __future__ import annotations

import json
import re

SRC = "/root/reference/src/main/js/pdf.combined.js"
OUT = ("/root/repo/iesl_pdf_to_text_ray/pdf/data/bidi_types.json")


def main() -> None:
    src = open(SRC, encoding="utf-8").read()

    def table(name: str) -> list[str]:
        m = re.search(r"var %s = \[(.*?)\];" % name, src, re.S)
        vals = [s.strip().strip("'")
                for s in m.group(1).replace("\n", "").split(",")]
        assert len(vals) == 256, (name, len(vals))
        return vals

    json.dump({"base": table("baseTypes"), "arabic": table("arabicTypes")},
              open(OUT, "w"), indent=0)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
