"""Generate the static font data tables (JSON) from public data.

The tables are public-spec data: the Adobe Glyph List (AGL) and ITC Zapf
Dingbats glyph list, the PDF-spec Appendix D standard encodings, the Adobe
AFM metrics for the standard-14 fonts, and the conventional alias map of
common system fonts onto the standard 14.  They are extracted from the data
sections of the reference bundle (which reproduces the same public tables)
and written to iesl_pdf_to_text_ray/pdf/data/*.json.
"""

from __future__ import annotations

import json
import re

SRC = "/root/reference/src/main/js/pdf.combined.js"
OUT = "/root/repo/iesl_pdf_to_text_ray/pdf/data/"


def section(src: str, start_pat: str, end_pat: str) -> str:
    i = src.index(start_pat)
    j = src.index(end_pat, i)
    return src[i:j]


def parse_kv_int(body: str) -> dict[str, int]:
    return {m.group(1): int(m.group(2), 0)
            for m in re.finditer(r"t\['([^']*)'\] = (0x[0-9A-Fa-f]+|\d+);", body)}


def parse_js_string_array(body: str) -> list[str]:
    # bodies are arrays of single-quoted names (possibly wrapped over lines)
    return re.findall(r"'([^']*)'", body)


def main():
    src = open(SRC, encoding="utf-8").read()

    # Adobe Glyph List
    glyphs = parse_kv_int(section(src, "var getGlyphsUnicode = getLookupTableFactory",
                                  "var getDingbatsGlyphsUnicode"))
    assert len(glyphs) > 4000, len(glyphs)
    json.dump(glyphs, open(OUT + "glyphlist.json", "w"))

    dingbats = parse_kv_int(section(src, "var getDingbatsGlyphsUnicode",
                                    "exports.getGlyphsUnicode"))
    assert len(dingbats) > 150, len(dingbats)
    json.dump(dingbats, open(OUT + "dingbats.json", "w"))

    # Standard encodings (PDF spec Appendix D)
    encodings = {}
    for name in ("ExpertEncoding", "MacExpertEncoding", "MacRomanEncoding",
                 "StandardEncoding", "WinAnsiEncoding", "SymbolSetEncoding",
                 "ZapfDingbatsEncoding"):
        body = section(src, f"var {name} = [", "];")
        arr = parse_js_string_array(body)
        assert 250 <= len(arr) <= 256, (name, len(arr))
        arr += [""] * (256 - len(arr))  # JS literal may omit trailing holes
        encodings[name] = arr
    json.dump(encodings, open(OUT + "encodings.json", "w"))

    # Standard font aliases & classification sets
    std_map = {m.group(1): m.group(2) for m in re.finditer(
        r"t\['([^']*)'\] = '([^']*)';",
        section(src, "var getStdFontMap", "var getNonStdFontMap"))}
    non_std_map = {m.group(1): m.group(2) for m in re.finditer(
        r"t\['([^']*)'\] = '([^']*)';",
        section(src, "var getNonStdFontMap", "var getSerifFonts"))}
    serif = re.findall(r"t\['([^']*)'\] = true;",
                       section(src, "var getSerifFonts", "var getSymbolsFonts"))
    symbols = re.findall(r"t\['([^']*)'\] = true;",
                         section(src, "var getSymbolsFonts", "exports."))
    json.dump({"stdFontMap": std_map, "nonStdFontMap": non_std_map,
               "serifFonts": serif, "symbolsFonts": symbols},
              open(OUT + "stdfonts.json", "w"))

    # Standard-14 AFM metrics (glyph-name -> width, or scalar for monospace)
    met_src = section(src, "var getMetrics = getLookupTableFactory",
                      "exports.getMetrics")
    metrics: dict[str, object] = {}
    # nested per-font width tables first; excise them so the scalar pass
    # (monospace default widths) only sees top-level entries
    def grab_nested(m):
        metrics[m.group(1)] = parse_kv_int(m.group(2))
        return ""
    remainder = re.sub(
        r"t\['([\w-]+)'\] = getLookupTableFactory\(function \(t\) \{(.*?)\}\);",
        grab_nested, met_src, flags=re.S)
    for m in re.finditer(r"t\['([\w-]+)'\] = (\d+);", remainder):
        metrics[m.group(1)] = int(m.group(2))
    assert "Helvetica" in metrics and "Times-Roman" in metrics, metrics.keys()
    json.dump(metrics, open(OUT + "metrics.json", "w"))

    print({k: (len(v) if isinstance(v, (dict, list)) else v)
           for k, v in metrics.items()})
    print("glyphs", len(glyphs), "dingbats", len(dingbats),
          "stdmap", len(std_map), "serif", len(serif))


if __name__ == "__main__":
    main()
