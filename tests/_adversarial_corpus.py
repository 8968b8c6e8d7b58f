"""Adversarial documents fixture (r10, VERDICT r9 #4 / missing #4).

The driver corpus is pure ASCII, so the text/dedup family's behavior on
multi-byte, empty, NULL, and degenerate documents was documented but
never exercised.  This module builds a small deterministic corpus that
stresses exactly those edges:

- multi-byte UTF-8: accented Latin, CJK, emoji (incl. surrogate-pair
  code points), RTL Arabic/Hebrew, combining characters
- degenerate shapes: empty string, single char (ASCII and multi-byte),
  whitespace-only, control characters, quotes/backslashes, NULL text
- long documents (multi-byte repeated past every shingle width)
- planted exact duplicates and near-duplicates ACROSS script families,
  so the dedup operators have real work on non-ASCII text

Schema matches the driver corpus exactly: (doc_id int64, text string,
lang string, source string, n_chars int64) with n_chars = len(text)
in CHARACTERS (Python/Spark/DuckDB all agree on code-point length).
"""

from __future__ import annotations

import os

LANGS = ["en", "es", "de", "fr", "zh"]
# r11: source names follow the driver's src{N} convention.  The r10 list
# ("web", "wiki", ...) made every src0-keyed query VACUOUS on this corpus:
# benchmark_contamination's benchmark side (source = 'src0') was empty, so
# AQE empty-relation propagation erased the train scan and its <5-word
# five-gram crash sat green for a round (fixed in operators/text.py).
# weighted_mix_counts' web bucket (src0-2) was likewise empty.
SOURCES = ["src0", "src1", "src2", "src3", "src4"]

_BASE_TEXTS = [
    # plain ASCII controls (the family must still work on normal text)
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    # accented Latin / multi-byte 2-byte sequences
    "el niño comió paella y bebió sangría en la fiesta de São Paulo",
    "über den Wölkchen müssen die Gefühle wohl grenzenlos sein",
    "le cœur a ses raisons que la raison ne connaît point",
    # CJK (3-byte sequences, no spaces — tokenizers see ONE huge token)
    "道可道非常道名可名非常名无名天地之始有名万物之母",
    "吾輩は猫である。名前はまだ無い。どこで生れたかとんと見当がつかぬ。",
    # emoji incl. ZWJ sequences and surrogate-pair code points
    "launch day 🚀🚀🚀 the team 👩‍💻👨‍💻 shipped it 🎉",
    "🤖 beep boop 🤖 robots 🦾 everywhere 🤖",
    # RTL Arabic + Hebrew, with embedded ASCII
    "السلام عليكم ورحمة الله وبركاته hello world",
    "שלום עולם זה מבחן של טקסט בעברית test",
    # combining characters: e + U+0301 vs precomposed é
    "café latte versus café latte, séance vs séance",
    # mixed scripts in one doc
    "english 中文 العربية עברית español 🚀 all in one line",
    # quotes, backslashes, regex metacharacters
    'she said "it\'s \\ a trap" and (then) [left] {fast} | for $5 ^ up',
    # control characters (tab, newline embedded, \x01)
    "line one\nline two\ttabbed\x01control",
]

_DEGENERATE = [
    "",            # empty string
    "a",           # single ASCII char
    "é",           # single 2-byte char
    "中",           # single 3-byte char
    "🚀",           # single 4-byte (surrogate-pair) char
    " ",           # single space
    "   \t  \n ",  # whitespace-only
    "word",        # single token
    "a b",         # two minimal tokens
]


def multibyte_slice_texts() -> list[str]:
    """The multi-byte texts that seed the sf1/sf10 ADVERSARIAL SLICE
    (VERDICT r10 #6): ``tools/make_sf1.py`` rewrites 5% of source
    documents with these, so the full-registry gate decades carry
    non-ASCII text instead of quarantining it in the 58-query fixture.

    Deliberately excludes the NULL/empty/whitespace degenerates (those
    stay fixture-only: a NULL-text slice would change every rowcount in
    the decade bench history for no extra oracle signal) and keeps only
    texts whose oracle parity the r10 fixture proved.  The slice is
    injected at ``doc_id >= 150`` only, keeping multi-byte text out of
    ``dedup_levenshtein_pairs`` (doc_id < 150), the one operator whose
    DuckDB oracle counts BYTES, not code points."""
    long_docs = [
        "αβγδεζηθ" * 400,
        "中文字符串测试" * 300,
        ("the fox " * 200) + "🚀",
        "é" * 500,
    ]
    return _BASE_TEXTS[2:] + long_docs


def build_rows() -> list[dict]:
    """Deterministic corpus: ~230 docs, ids 0..n-1."""
    rows: list[dict] = []

    def add(text, lang=None, source=None):
        i = len(rows)
        rows.append(
            {
                "doc_id": i,
                "text": text,
                "lang": lang or LANGS[i % len(LANGS)],
                "source": source or SOURCES[i % len(SOURCES)],
                "n_chars": None if text is None else len(text),
            }
        )

    # 1) the base texts, then EXACT duplicates of every one (dedup work),
    #    then near-duplicates (one word appended)
    for t in _BASE_TEXTS:
        add(t)
    for t in _BASE_TEXTS:
        add(t)  # exact dup, different doc_id/lang/source cycle
    for t in _BASE_TEXTS:
        add(t + " extra")  # near-dup

    # 2) degenerate shapes, twice (so even they can dedup)
    for t in _DEGENERATE + _DEGENERATE:
        add(t)

    # 3) NULL text rows — more than one, so a fake shared fingerprint
    #    would visibly collide them
    for _ in range(4):
        add(None)

    # 4) long documents: multi-byte repeated well past shingle widths,
    #    and a long doc whose 8-byte windows straddle code points
    add("αβγδεζηθ" * 400)                       # 3.2k chars, all 2-byte
    add("中文字符串测试" * 300)                    # 2.1k chars, all 3-byte
    add(("the fox " * 200) + "🚀")               # ASCII tail-emoji
    add("é" * 500)                         # combining-char run

    # 5) filler variety so per-(lang, source) groups are non-trivial:
    #    deterministic ASCII+accent sentences
    for i in range(120):
        add(
            f"documento número {i} with sómé áccents and id{i} "
            f"{'palabra ' * (i % 7)}end",
        )
    return rows


def write_corpus(dir_path: str) -> str:
    """Write documents.parquet into ``dir_path``; returns the dir."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = build_rows()
    os.makedirs(dir_path, exist_ok=True)
    table = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            "source": pa.array([r["source"] for r in rows], pa.string()),
            "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(dir_path, "documents.parquet"))
    return dir_path
