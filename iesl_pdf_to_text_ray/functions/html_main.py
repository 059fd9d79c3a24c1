"""HTML main-content extraction (boilerplate strip) — the third leg of
the north-rule extraction family beside PDF/layout parse and DOM
heuristics.

Algorithm: shallow-DOM block segmentation + density classification in
the style of the public boilerplate-removal literature (Kohlschuetter et
al., "Boilerplate Detection using Shallow Text Features", WSDM 2010;
Pomikalek, "Removing Boilerplate and Duplicate Content from Web
Corpora", 2011 — jusText).  No third-party parser: the DOM is built with
the stdlib ``html.parser`` and the classifier uses three shallow
features per block (word count, link density, stopword density) plus the
jusText-style neighborhood smoothing pass.

Output is the engine's interleaved span model — rows of
``(kind, text, media_ref, offset)`` with ``kind='text'`` for retained
blocks and ``kind='media'`` for <img> references in document order —
exactly the (doc_id, spans) shape the PDF extractor emits, so every
downstream operator (normalization, dedup, quality, layout) runs
unchanged on web documents.
"""

from __future__ import annotations

from html.parser import HTMLParser

# elements whose entire subtree is boilerplate or non-content by contract
DROP_TAGS = frozenset("""script style noscript template nav header footer
    aside form button select option iframe svg canvas""".split())
# block-level boundaries: text accumulates per nearest block ancestor
BLOCK_TAGS = frozenset("""p div li h1 h2 h3 h4 h5 h6 td th blockquote pre
    article section main figure figcaption dd dt ul ol table tr body""".split())
VOID_TAGS = frozenset("""area base br col embed hr img input link meta
    param source track wbr""".split())

# compact English stopword set (public, function words only) — the
# stopword-density feature only needs common function words
STOPWORDS = frozenset("""a an and are as at be but by for from has have he
    in is it its of on or that the to was were will with this which you
    your not they his her she we our us i all can had do if about into
    than then there these those when who whom what where why how been
    being over under again once more most other some such no nor only
    own same so too very just also after before between both each few
    during out up down off above below""".split())

# classification thresholds (jusText-flavored defaults)
MAX_LINK_DENSITY = 0.35
MIN_GOOD_WORDS = 8
MIN_STOP_DENSITY = 0.25


class _Block:
    __slots__ = ("texts", "link_chars", "media", "tag")

    def __init__(self, tag: str):
        self.tag = tag
        self.texts: list[str] = []
        self.link_chars = 0
        # media refs interleaved with this block's text: list of
        # (position_in_texts, src)
        self.media: list[tuple[int, str]] = []

    def text(self) -> str:
        return " ".join(" ".join(self.texts).split())


class _MainContentParser(HTMLParser):
    """One pass: segments character data into blocks at BLOCK_TAGS
    boundaries, drops DROP_TAGS subtrees, tracks anchor-text mass and
    <img> positions."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = [_Block("body")]
        self.drop_depth = 0
        self.anchor_depth = 0

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag in DROP_TAGS:
            if tag not in VOID_TAGS:
                self.drop_depth += 1
            return
        if self.drop_depth:
            return
        if tag == "a":
            self.anchor_depth += 1
        if tag == "img":
            src = dict(attrs).get("src") or ""
            if src:
                blk = self.blocks[-1]
                blk.media.append((len(blk.texts), src))
            return
        if tag in BLOCK_TAGS:
            self.blocks.append(_Block(tag))

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag in DROP_TAGS:
            self.drop_depth = max(0, self.drop_depth - 1)
            return
        if self.drop_depth:
            return
        if tag == "a":
            self.anchor_depth = max(0, self.anchor_depth - 1)
        if tag in BLOCK_TAGS:
            # close the current block; subsequent text joins a fresh
            # sibling block of the parent flow
            self.blocks.append(_Block(tag))

    def handle_data(self, data):
        if self.drop_depth:
            return
        s = data.strip()
        if not s:
            return
        blk = self.blocks[-1]
        blk.texts.append(s)
        if self.anchor_depth:
            blk.link_chars += len(s)


def _classify(blocks: list[_Block]) -> list[str]:
    """Per-block label good/near/bad from the three shallow features,
    then the jusText smoothing pass: near-good blocks adjacent to a good
    block are promoted (headings ride on their section's verdict)."""
    labels = []
    for b in blocks:
        t = b.text()
        if not t and not b.media:
            labels.append("empty")
            continue
        words = t.split()
        n = len(words)
        link_density = (b.link_chars / len(t)) if t else 0.0
        stop_density = (sum(1 for w in words
                            if w.lower().strip(".,;:!?()\"'") in STOPWORDS)
                        / n) if n else 0.0
        if link_density > MAX_LINK_DENSITY:
            labels.append("bad")
        elif n >= MIN_GOOD_WORDS and stop_density >= MIN_STOP_DENSITY:
            labels.append("good")
        elif n >= MIN_GOOD_WORDS:
            labels.append("bad")          # long but alien-density: lists,
        else:                             # code, keyword stuffing
            labels.append("near")         # short: heading / caption
    # smoothing: near -> good when an adjacent non-empty block is good
    out = list(labels)
    idx = [i for i, l in enumerate(labels) if l != "empty"]
    for pos, i in enumerate(idx):
        if labels[i] != "near":
            continue
        prev_l = labels[idx[pos - 1]] if pos > 0 else None
        next_l = labels[idx[pos + 1]] if pos + 1 < len(idx) else None
        out[i] = "good" if ("good" in (prev_l, next_l)) else "bad"
    return out


def parse_blocks(html: str):
    """One parser pass over the document; returns the segmented blocks.
    Callers needing both a label census and span extraction parse once
    here and feed the blocks to ``_classify`` / ``spans_from_blocks``."""
    p = _MainContentParser()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass   # stdlib parser is lenient; keep whatever was segmented
    return p.blocks


def extract_main_spans(html: str) -> list[dict]:
    """HTML string -> interleaved span dicts
    ``{kind, text, media_ref, offset}`` in document order: retained text
    blocks plus <img> refs belonging to retained blocks (an image inside
    a boilerplate block is boilerplate too — e.g. nav logos)."""
    blocks = parse_blocks(html)
    return spans_from_blocks(blocks, _classify(blocks))


def spans_from_blocks(blocks, labels) -> list[dict]:
    spans: list[dict] = []
    offset = 0
    for b, label in zip(blocks, labels):
        if label != "good":
            continue
        # interleave media at their recorded positions within the block
        cut = 0
        for pos, src in b.media:
            pre = " ".join(" ".join(b.texts[cut:pos]).split())
            if pre:
                spans.append({"kind": "text", "text": pre,
                              "media_ref": "", "offset": offset})
                offset += 1
            spans.append({"kind": "media", "text": "",
                          "media_ref": src, "offset": offset})
            offset += 1
            cut = pos
        tail = " ".join(" ".join(b.texts[cut:]).split())
        if tail:
            spans.append({"kind": "text", "text": tail,
                          "media_ref": "", "offset": offset})
            offset += 1
    return spans
