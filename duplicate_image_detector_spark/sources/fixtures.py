"""Deterministic synthetic `pages` corpus with planted duplicate families.

Implements FIXTURES.md: schema is exactly the BASELINE.json input hint
(url, warc_ts, html, text, lang); `text` is derived from `html` by the same
pure function the engine's extraction UDF uses, so the byte-identity
invariant is verifiable.  Families F1-F7 plant known ground truth:

  F1 exact            byte-identical text under k distinct urls
  F2 near-template    1-1.2% token substitutions  (5-shingle Jaccard >= ~0.88)
  F3 para-shuffle     same paragraphs, permuted    (Jaccard ~> 0.95)
  F4 boilerplate      60% shared header/footer, distinct core (negative;
                      hot-bucket/skew driver — must NOT merge)
  F5 long shared span one verbatim >= 400-char span, overall Jaccard < 0.86
  F6 cross-lang       disjoint vocabularies (negative)
  F7 short-doc        < min_text_len chars (filtered, no crash)

Everything is seeded (default 42); no wall-clock, no external data.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

import pandas as pd

_EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)
_HOSTS = [
    "news.example.com",
    "blog.example.org",
    "shop.example.net",
    "wiki.example.io",
    "forum.example.dev",
]


def _vocab(prefix: str, n: int) -> list[str]:
    return [f"{prefix}{i:04d}" for i in range(n)]


_EN = _vocab("tok", 5000)
_DE = _vocab("wort", 3000)
_FR = _vocab("mot", 3000)


def _paragraph(rng: random.Random, vocab: list[str], lo: int = 30, hi: int = 120) -> str:
    return " ".join(rng.choice(vocab) for _ in range(rng.randint(lo, hi)))


def _doc(rng: random.Random, vocab: list[str], n_par: tuple[int, int] = (3, 12)) -> list[str]:
    return [_paragraph(rng, vocab) for _ in range(rng.randint(*n_par))]


def _substitute(rng: random.Random, paragraphs: list[str], rate: float, vocab: list[str]) -> list[str]:
    out = []
    for p in paragraphs:
        words = p.split(" ")
        for i in range(len(words)):
            if rng.random() < rate:
                words[i] = rng.choice(vocab)
        out.append(" ".join(words))
    return out


def _html(title: str, paragraphs: list[str]) -> bytes:
    """Realistic page chrome around the paragraphs: doctype, head with
    title/style, comments, an inline-markup lead word, and a script blob in
    the body — everything the extractor must strip or decode to honor the
    byte-identity invariant (text == extract(html))."""
    import html as _h

    parts = []
    for i, p in enumerate(paragraphs):
        esc = _h.escape(p)
        if i % 3 == 0 and " " in esc:
            head, rest = esc.split(" ", 1)
            esc = f"<b>{head}</b> {rest}"
        parts.append(f"<p>{esc}</p>")
    body = "".join(parts)
    return (
        "<!DOCTYPE html>"
        f"<html><head><title>{_h.escape(title)}</title>"
        "<style>p { margin: 0 }</style>"
        '<meta charset="utf-8"></head>'
        "<body><!-- rendered by fixture generator -->"
        '<script type="text/javascript">var x = "<p>not text</p>";</script>'
        f"{body}</body></html>"
    ).encode("utf-8")


def generate_pages(n_docs: int = 200, seed: int = 42) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (pages, truth).

    pages:  url, warc_ts, html (bytes), text, lang
    truth:  url, family ('exact'|'near'|'shuffle'|'boilerplate'|'substring'|
            'xlang'|'short'|'singleton'), family_id (int; docs sharing a
            family_id were planted together)
    """
    rng = random.Random(seed)
    rows: list[dict] = []
    truth: list[dict] = []
    fam_counter = 0

    def emit(paragraphs: list[str], family: str, fam_id: int, lang: str) -> None:
        i = len(rows)
        host = _HOSTS[min(int(rng.paretovariate(1.2)) - 1, len(_HOSTS) - 1)]
        url = f"https://{host}/{family}/doc-{i}"
        title = f"page {i}"
        html = _html(title, paragraphs)
        rows.append(
            {
                "url": url,
                "warc_ts": _EPOCH + timedelta(seconds=37 * i),
                "html": html,
                "text": "\n".join(paragraphs),
                "lang": lang,
            }
        )
        truth.append({"url": url, "family": family, "family_id": fam_id})

    # budget: ~30% planted, ~70% singletons
    n_planted_families = max(1, n_docs * 3 // 10 // 4)
    per_kind = max(1, n_planted_families // 6)

    for _ in range(per_kind):  # F1 exact
        fam_counter += 1
        base = _doc(rng, _EN)
        for _ in range(rng.randint(2, 6)):
            emit(base, "exact", fam_counter, "en")

    for _ in range(per_kind):  # F2 near-template
        fam_counter += 1
        base = _doc(rng, _EN, (6, 12))
        emit(base, "near", fam_counter, "en")
        for _ in range(rng.randint(1, 3)):
            rate = rng.uniform(0.002, 0.012)
            emit(_substitute(rng, base, rate, _EN), "near", fam_counter, "en")

    for _ in range(per_kind):  # F3 paragraph shuffle
        fam_counter += 1
        base = _doc(rng, _EN, (6, 12))
        emit(base, "shuffle", fam_counter, "en")
        perm = base[:]
        rng.shuffle(perm)
        emit(perm, "shuffle", fam_counter, "en")

    # each boilerplate paragraph stays < 400 chars (tokens are 8 chars incl.
    # separator; 48*8-1 = 383) AND is interleaved with per-doc core
    # paragraphs, so no contiguous shared span reaches the substring tier's
    # L=400 — F4 must stay unmerged on BOTH near and substring tiers while
    # still sharing ~60% of its shingles (the hot-bucket driver)
    boiler = [_paragraph(rng, _EN, 30, 48) for _ in range(8)]
    for _ in range(per_kind):  # F4 boilerplate (hot-bucket driver, negative)
        fam_counter += 1
        for _ in range(rng.randint(2, 4)):
            doc: list[str] = []
            for b in boiler:
                doc.append(b)
                doc.append(_paragraph(rng, _EN, 15, 25))
            emit(doc, "boilerplate", fam_counter, "en")

    for _ in range(per_kind):  # F5 long shared span
        fam_counter += 1
        span = _paragraph(rng, _EN, 90, 120)  # >= ~400 chars verbatim
        for _ in range(2):
            left = _doc(rng, _EN, (4, 7))
            right = _doc(rng, _EN, (4, 7))
            emit(left + [span] + right, "substring", fam_counter, "en")

    for _ in range(per_kind):  # F6 cross-lang negatives
        fam_counter += 1
        emit(_doc(rng, _DE), "xlang", fam_counter, "de")
        emit(_doc(rng, _FR), "xlang", fam_counter, "fr")

    for _ in range(max(1, per_kind // 2)):  # F7 short docs
        fam_counter += 1
        emit([" ".join(rng.choice(_EN) for _ in range(3))], "short", fam_counter, "en")

    while len(rows) < n_docs:  # singletons
        fam_counter += 1
        lang = ("en", "en", "en", "en", "en", "en", "en", "en", "de", "fr")[len(rows) % 10]
        vocab = {"en": _EN, "de": _DE, "fr": _FR}[lang]
        emit(_doc(rng, vocab), "singleton", fam_counter, lang)

    return pd.DataFrame(rows), pd.DataFrame(truth)


def generate_pages_spark(
    spark,
    n_docs: int,
    seed: int = 42,
    n_partitions: int = 64,
    include_truth: bool = False,
):
    """Distributed corpus generation: each partition deterministically
    generates its slice with ``generate_pages(per_part, seed + pid)`` and a
    partition-unique host prefix.  This is how the bench corpus scales past
    what a single-process generator can produce (the generator itself obeys
    the engine's own rule: embarrassingly parallel, seed-deterministic,
    no cross-partition coordination).

    ``include_truth=True`` appends the planted ground-truth columns
    (``family``, ``family_id``) to every row — ``family_id`` is globally
    unique (partition-offset) so planted families never span partitions
    and recall can be measured at any corpus size (``bench.py --recall``).
    """
    per_part = max(1, n_docs // n_partitions)
    schema = (
        "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    if include_truth:
        schema += ", family string, family_id bigint"

    def gen(batches):
        for pdf in batches:
            for pid in pdf["id"]:
                pid = int(pid)
                pages, truth = generate_pages(per_part, seed=seed * 100003 + pid)
                pages = pages.copy()
                pages["url"] = pages["url"].str.replace(
                    "https://", f"https://p{pid}.", n=1, regex=False
                )
                cols = ["url", "warc_ts", "html", "text", "lang"]
                if include_truth:
                    pages["family"] = truth["family"]
                    pages["family_id"] = (
                        truth["family_id"].astype("int64") + pid * 1_000_000_000
                    )
                    cols += ["family", "family_id"]
                yield pages[cols]

    return (
        spark.range(n_partitions)
        .repartition(n_partitions)
        .mapInPandas(gen, schema=schema)
    )
