"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Generates the input_hint table ``(url, warc_ts, html, text, lang)`` with
planted structure driving the recall oracles:

- duplicate families (sizes 2-8, ~30% of rows): one template, members with
  seeded word-level edits calibrated to keep word-5-gram Jaccard high;
- exact duplicates (0-edit members);
- one oversized hot family (skew exercise for the salted band aggregation);
- near-miss pairs at Jaccard ≈ 0.3-0.5 that must NOT cluster;
- singletons (must survive the keep-rule);
- short docs (< ngram_size tokens, degenerate shingle case).

Everything is seeded (seed=42 default, numpy RandomState) — no wall clock,
no external data. The generator also returns ground truth: per-url family
ids, the set of high-similarity duplicate pairs (true 5-gram Jaccard >= 0.9,
where single-band LSH detection probability at (B,R)=(8,8) is ~0.99+), and
the near-miss pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

BASE_TS = pd.Timestamp("2024-01-01T00:00:00")


def _five_gram_jaccard(a: list[str], b: list[str], n: int = 5) -> float:
    def sh(t: list[str]) -> set[str]:
        if len(t) < n:
            return {" ".join(t)} if t else set()
        return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

    sa, sb = sh(a), sh(b)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def _edit(tokens: list[str], n_edits: int, rng: np.random.RandomState, vocab: np.ndarray) -> list[str]:
    out = list(tokens)
    for _ in range(n_edits):
        op = rng.randint(3)
        pos = rng.randint(len(out))
        if op == 0:
            out[pos] = str(vocab[rng.randint(len(vocab))])
        elif op == 1 and len(out) > 10:
            del out[pos]
        else:
            out.insert(pos, str(vocab[rng.randint(len(vocab))]))
    return out


def generate_web_pages_pandas(
    n_rows: int = 1000, seed: int = 42, hot_family: bool = True
) -> tuple[pd.DataFrame, dict]:
    """Build the corpus as a pandas frame + ground truth dict."""
    rng = np.random.RandomState(seed)
    vocab = np.array([f"tok{i:04d}" for i in range(2000)])
    langs = np.array(["en", "fr", "es", "de", "zh"])

    rows: list[dict] = []
    truth_family: dict[str, int] = {}
    dup_pairs: list[tuple[str, str]] = []
    near_miss_pairs: list[tuple[str, str]] = []
    fam_id = 0

    def add_row(text_tokens: list[str], fam: int | None) -> str:
        i = len(rows)
        url = f"https://site{i % 50}.example/p/{i}"
        text = " ".join(text_tokens)
        html = (
            f"<html><body><p>{text}</p></body></html>".encode()
            if rng.rand() > 0.2
            else None
        )
        rows.append(
            {
                "url": url,
                "warc_ts": BASE_TS + pd.Timedelta(seconds=int(rng.randint(0, 10**7))),
                "html": html,
                "text": text,
                "lang": str(langs[rng.randint(len(langs))]),
            }
        )
        if fam is not None:
            truth_family[url] = fam
        return url

    n_family_rows = int(n_rows * 0.30)
    n_hot = min(100, n_rows // 10) if hot_family else 0

    # hot family — identical boilerplate + tiny noise (skew driver)
    if n_hot:
        fam_id += 1
        template = [str(w) for w in vocab[rng.randint(len(vocab), size=120)]]
        members = []
        for _ in range(n_hot):
            toks = _edit(template, rng.randint(0, 2), rng, vocab)
            members.append((add_row(toks, fam_id), toks))
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                if _five_gram_jaccard(members[i][1], members[j][1]) >= 0.9:
                    dup_pairs.append((members[i][0], members[j][0]))

    # regular duplicate families
    while sum(1 for _ in truth_family) < n_family_rows and len(rows) < n_rows:
        fam_id += 1
        size = int(rng.randint(2, 9))
        length = int(rng.randint(80, 401))
        template = [str(w) for w in vocab[rng.randint(len(vocab), size=length)]]
        members = []
        for k in range(size):
            if len(rows) >= n_rows:
                break
            # 0 edits → exact dup; else ~1 edit per 150 tokens → J >= ~0.9
            n_edits = 0 if k == 1 else max(1, length // 150)
            toks = template if k == 0 or n_edits == 0 else _edit(template, n_edits, rng, vocab)
            members.append((add_row(toks, fam_id), toks))
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                if _five_gram_jaccard(members[i][1], members[j][1]) >= 0.9:
                    dup_pairs.append((members[i][0], members[j][0]))

    # near-miss pairs (~5% of rows): share half the tokens → J(5-gram) << 0.7
    n_near = max(0, min(n_rows - len(rows) - 10, int(n_rows * 0.05))) // 2
    for _ in range(n_near):
        length = int(rng.randint(60, 200))
        base = [str(w) for w in vocab[rng.randint(len(vocab), size=length)]]
        other = list(base)
        for pos in rng.choice(length, size=length // 2, replace=False):
            other[pos] = str(vocab[rng.randint(len(vocab))])
        u1 = add_row(base, None)
        u2 = add_row(other, None)
        near_miss_pairs.append((u1, u2))

    # short docs (degenerate: < 5 tokens)
    for _ in range(min(5, max(0, n_rows - len(rows)))):
        add_row([str(w) for w in vocab[rng.randint(len(vocab), size=rng.randint(1, 4))]], None)

    # singletons fill the remainder
    while len(rows) < n_rows:
        length = int(rng.randint(40, 300))
        add_row([str(w) for w in vocab[rng.randint(len(vocab), size=length)]], None)

    pdf = pd.DataFrame(rows)
    truth = {
        "family": truth_family,
        "dup_pairs": dup_pairs,
        "near_miss_pairs": near_miss_pairs,
    }
    return pdf, truth


def generate_web_pages(spark, n_rows: int = 1000, seed: int = 42, hot_family: bool = True):
    """Spark DataFrame variant with the exact input_hint schema."""
    pdf, truth = generate_web_pages_pandas(n_rows, seed, hot_family)
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    return spark.createDataFrame(pdf, schema=schema), truth
