"""XMP metadata parsing + page viewport size — the rest of the
reference's getinfo surface (/root/reference/src/main/js/node/getinfo.js:
38-42 prints the parsed metadata map, :48-50 prints per-page
``Size: WxH`` from ``page.getViewport(1.0)``).

``parse_xmp`` mirrors pdf.js Metadata (pdf.combined.js:19554-19631): find
the rdf:RDF element (possibly wrapped in x:xmpmeta), then for every
rdf:Description child map ``lowercase(tag) -> textContent.trim()``.

The reference CLI parses the XMP with the regex-based DOMParserMock
(node/domparsermock.js), NOT a real XML parser, and the mock has a
load-bearing quirk: its text pass matches ``>([\\s\\S]+?)<`` so an
element open tag immediately followed by a child tag (``...'><pdf:...``)
swallows the child's open tag into a text node, truncating that
rdf:Description — Ghostscript-style XMP therefore parses to ``{}`` even
though the map "should" have entries (verified against the reference via
node on 1301.4293).  ``_mock_parse`` replicates the mock's algorithm
regex-for-regex so the produced maps are equal on every input.

``page_view_size`` mirrors PageViewport (pdf.combined.js:3145-3190) at
scale 1.0 over ``Page.view`` (cropBox intersected with mediaBox,
pdf.combined.js:48830-48855): rotation 90/270 swaps width/height.
"""

from __future__ import annotations

import re

from .objects import Name, Stream

LETTER_SIZE_MEDIABOX = [0, 0, 612, 792]


def fix_metadata(meta: str) -> str:
    """Ghostscript writes invalid XMP with octal-escaped UTF-16BE text
    (``>\\376\\377...``); the reference entity-encodes every code unit
    (pdf.combined.js:19555-19570)."""
    def repl(m: re.Match) -> str:
        bytes_str = re.sub(
            r"\\([0-3])([0-7])([0-7])",
            lambda c: chr(int(c.group(1)) * 64 + int(c.group(2)) * 8
                          + int(c.group(3))),
            m.group(1))
        chars = []
        for i in range(0, len(bytes_str) - 1, 2):
            code = ord(bytes_str[i]) * 256 + ord(bytes_str[i + 1])
            chars.append("&#x" + format(0x10000 + code, "x")[1:] + ";")
        return ">" + "".join(chars)
    return re.sub(r">\\376\\377([^<]+)", repl, meta)


class _MockNode:
    """DOMNodeMock (domparsermock.js:6-30): a name, an optional value,
    and (for elements only) a child list."""

    __slots__ = ("name", "value", "children")

    def __init__(self, name: str, value: str | None = None):
        self.name = name
        self.value = value
        self.children: list | None = None    # undefined for #text nodes

    def text_content(self) -> str:
        if self.children is None:
            return self.value or ""
        return "".join(c.text_content() for c in self.children)


_PI_COMMENT = re.compile(r"<\?[\s\S]*?\?>|<!--[\s\S]*?-->")
_TEXT_RUN = re.compile(r">([\s\S]+?)<")
_CDATA = re.compile(r"<!\[CDATA\[([\s\S]*?)\]\]>")
# attrs charclass and element name use JS \w == [A-Za-z0-9_]
_ELEMENT = re.compile(
    r"<([\w:]+)((?:[\s\w:=]|'[^']*'|\"[^\"]*\")*)(?:/>|>([\d,]*)</[^>]+>)",
    re.ASCII)
_ENTITY = re.compile(r"&(#(x[0-9a-f]+|\d+)|\w+);", re.I | re.ASCII)
_NAMED_ENTITIES = {"amp": "&", "lt": "<", "gt": ">",
                   "quot": '"', "apos": "'"}


def _decode_xml(text: str) -> str:
    """decodeXML (domparsermock.js:32-54); the named-entity switch is
    case-SENSITIVE even though the regex is case-insensitive."""
    if "&" not in text:
        return text

    def repl(m: re.Match) -> str:
        number = m.group(2)
        if number:
            if number[0] == "x":
                return chr(int(number[1:], 16) & 0xFFFF)
            if number[0] == "X":          # JS +('X..') is NaN -> U+0000
                return "\x00"
            return chr(int(number) & 0xFFFF)
        return _NAMED_ENTITIES.get(m.group(1), "&" + m.group(1) + ";")
    return _ENTITY.sub(repl, text)


def _mock_parse(content: str) -> _MockNode | None:
    """DOMParserMock.parseFromString (domparsermock.js:57-105), including
    its text-run quirk; returns the documentElement (last node built)."""
    content = _PI_COMMENT.sub("", content).strip()
    nodes: list[_MockNode] = []

    def text_repl(m: re.Match) -> str:
        i = len(nodes)
        node = _MockNode("#text", _decode_xml(m.group(1)))
        nodes.append(node)               # pushed even when dropped below
        if not node.text_content().strip():
            return "><"                  # ignoring whitespaces
        return ">%d,<" % i
    content = _TEXT_RUN.sub(text_repl, content)

    def cdata_repl(m: re.Match) -> str:
        i = len(nodes)
        nodes.append(_MockNode("#text", m.group(1)))
        return "%d," % i
    content = _CDATA.sub(cdata_repl, content)

    while True:
        last_length = len(nodes)

        def elem_repl(m: re.Match) -> str:
            name, inner = m.group(1), m.group(3)
            node = _MockNode(name)
            node.children = []
            if inner:                    # '' (empty element) stays empty
                refs = inner.split(",")
                refs.pop()
                for r in refs:
                    node.children.append(nodes[int(r)])
            nodes.append(node)
            return "%d," % (len(nodes) - 1)
        content = _ELEMENT.sub(elem_repl, content)
        if len(nodes) <= last_length:
            break
    return nodes.pop() if nodes else None


def parse_xmp(meta: str) -> dict:
    """XMP string -> {lowercase tag: trimmed text} (Metadata.parse,
    pdf.combined.js:19589-19620, through the replicated mock parser)."""
    try:
        rdf = _mock_parse(fix_metadata(meta))
    except Exception:
        return {}
    if rdf is not None and rdf.name.lower() != "rdf:rdf":
        rdf = next((c for c in (rdf.children or [])
                    if c.name.lower() == "rdf:rdf"), None)
    if rdf is None or not rdf.children:
        return {}
    out: dict = {}
    for desc in rdf.children:
        if desc.name.lower() != "rdf:description":
            continue
        for entry in desc.children or []:
            if entry.name.lower() != "#text":
                out[entry.name.lower()] = entry.text_content().strip()
    return out


def extract_xmp(xref) -> dict:
    """Parsed XMP map from the catalog /Metadata stream, or {} —
    Catalog.metadata (pdf.combined.js:42556-42587): the stream must be
    Type/Metadata Subtype/XML and decode as UTF-8 (invalid -> skipped)."""
    ref = xref.root.get("Metadata")
    stream = xref.fetch_if_ref(ref)
    if not isinstance(stream, Stream):
        return {}
    d = stream.dict
    t, s = xref.fetch_if_ref(d.get("Type")), xref.fetch_if_ref(d.get("Subtype"))
    if not (isinstance(t, Name) and isinstance(s, Name)
            and str(t) == "Metadata" and str(s) == "XML"):
        return {}
    from .filters import decode_stream
    try:
        raw = decode_stream(stream, xref).decode("utf-8")
    except Exception:
        return {}
    return parse_xmp(raw)


def _normalize_rect(r):
    x1, y1, x2, y2 = r
    return [min(x1, x2), min(y1, y2), max(x1, x2), max(y1, y2)]


def _intersect(rect1, rect2):
    """Util.intersect (pdf.combined.js:3002-3036)."""
    ox = sorted([rect1[0], rect1[2], rect2[0], rect2[2]])
    oy = sorted([rect1[1], rect1[3], rect2[1], rect2[3]])
    r1, r2 = _normalize_rect(rect1), _normalize_rect(rect2)
    if not ((ox[0] == r1[0] and ox[1] == r2[0])
            or (ox[0] == r2[0] and ox[1] == r1[0])):
        return None
    if not ((oy[0] == r1[1] and oy[1] == r2[1])
            or (oy[0] == r2[1] and oy[1] == r1[1])):
        return None
    return [ox[1], oy[1], ox[2], oy[2]]


def page_view_size(page) -> tuple[float, float]:
    """(width, height) of getViewport(1.0) for a Page whose dict carries
    the inherited MediaBox/CropBox/Rotate."""
    fetch = page.xref.fetch_if_ref
    media = fetch(page.dict.get("MediaBox"))
    if not (isinstance(media, list) and len(media) == 4):
        media = LETTER_SIZE_MEDIABOX
    media = [fetch(v) for v in media]
    view = media
    crop = fetch(page.dict.get("CropBox"))
    if isinstance(crop, list) and len(crop) == 4:
        crop = _intersect([fetch(v) for v in crop], media)
        if crop:
            view = crop
    rotate = fetch(page.dict.get("Rotate")) or 0
    if not isinstance(rotate, (int, float)) or rotate % 90 != 0:
        rotate = 0
    rotate = int(rotate) % 360
    w = abs(view[2] - view[0])
    h = abs(view[3] - view[1])
    if rotate in (90, 270):
        w, h = h, w
    return float(w), float(h)
