"""Deterministic synthetic `pages` corpus with exported ground truth.

Implements FIXTURES.md §1-§2: seeded, no wall clock, no external data.
Slices: uniques ~55%, exact-dup groups ~15%, near-dup groups ~15%,
near-miss decoys ~8%, containment ~5%, boilerplate skew ~2%, plus fixed
edge-case rows. Ground truth (exact clusters, pair Jaccards, transitive
clusters) is computed EXACTLY in the generator, so recall/precision tests
never depend on the mutation dice.

The Jaccard here is over the same word-k-shingle definition the engine
uses (functions/text.py::word_shingles), keeping oracle and engine pinned
to one shingle config (BASELINE.json north_rule).
"""

from __future__ import annotations

import datetime as dt
import itertools
import random
from dataclasses import dataclass, field

_BASE_TS = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

_LANGS = ["en", "de", "uk", "fr"]
_LANG_EXTRA = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "un", "est"],
    "uk": ["і", "та", "в", "на", "це", "що", "не"],
}


def _vocab(lang: str, size: int = 800) -> list[str]:
    base = [f"{lang}w{i:04d}" for i in range(size)]
    return base + _LANG_EXTRA[lang] * 8  # stopwords appear often


def shingle_set(text: str, k: int = 3) -> set[str]:
    """Word-k-shingles; must mirror functions/text.py::word_shingles."""
    toks = text.split()
    if not toks:
        return set()
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


@dataclass
class Corpus:
    rows: list[dict] = field(default_factory=list)          # pages rows
    truth_exact: list[dict] = field(default_factory=list)   # cluster_id,url
    # rows: url_a, url_b, jaccard, kind
    truth_pairs: list[dict] = field(default_factory=list)
    truth_clusters: list[dict] = field(default_factory=list)
    keep_overrides: list[dict] = field(default_factory=list)


class _Gen:
    def __init__(self, seed: int, shingle_k: int):
        self.rng = random.Random(seed)
        self.k = shingle_k
        self.page_id = 0
        self.corpus = Corpus()
        self._cluster_seq = 0

    # -- primitives ----------------------------------------------------------

    def _zipf_tokens(self, vocab: list[str], n: int) -> list[str]:
        # Zipf-ish: rank-weighted choice without numpy (keeps gen portable)
        out = []
        v = len(vocab)
        for _ in range(n):
            r = self.rng.random()
            idx = int(v * (r ** 2.2))  # skew toward low ranks
            out.append(vocab[min(idx, v - 1)])
        return out

    def _base_text(self, lang: str, lo: int = 40, hi: int = 700) -> str:
        n = self.rng.randint(lo, hi)
        return " ".join(self._zipf_tokens(_vocab(lang), n))

    def _add_page(self, text: str, lang: str, *,
                  html: bytes | None = None) -> str:
        pid = self.page_id
        self.page_id += 1
        site = pid % 97
        url = f"https://site{site:03d}.example/p/{pid:08d}"
        row = {
            "url": url,
            "warc_ts": _BASE_TS + dt.timedelta(seconds=pid * 7),
            "html": html if html is not None
            else b"<html><body>" + text.encode("utf-8") + b"</body></html>",
            "text": text,
            "lang": lang,
        }
        self.corpus.rows.append(row)
        return url

    def _mutate(self, toks: list[str], n_edits: int,
                vocab: list[str]) -> list[str]:
        toks = list(toks)
        for _ in range(n_edits):
            if not toks:
                break
            op = self.rng.choice(("swap", "drop", "insert"))
            i = self.rng.randrange(len(toks))
            if op == "swap":
                repl = self.rng.choice(vocab)
                while repl == toks[i]:
                    repl = self.rng.choice(vocab)
                toks[i] = repl
            elif op == "drop" and len(toks) > 1:
                toks.pop(i)
            else:
                toks.insert(i, self.rng.choice(vocab))
        return toks

    def _next_cluster(self) -> int:
        self._cluster_seq += 1
        return self._cluster_seq

    # -- slices ---------------------------------------------------------------

    def uniques(self, n: int) -> None:
        for _ in range(n):
            lang = self.rng.choice(_LANGS)
            self._add_page(self._base_text(lang), lang)

    def exact_groups(self, n_pages: int) -> None:
        made = 0
        while made < n_pages:
            k = self.rng.randint(2, 8)
            k = min(k, n_pages - made) if n_pages - made >= 2 else 2
            lang = self.rng.choice(_LANGS)
            text = self._base_text(lang)
            cid = self._next_cluster()
            for _ in range(k):
                url = self._add_page(text, lang)
                self.corpus.truth_exact.append({"cluster_id": cid, "url": url})
            made += k

    def near_groups(self, n_pages: int, threshold: float) -> None:
        """Mutated copies; pairs labeled near/decoy by EXACT jaccard."""
        made = 0
        while made < n_pages:
            k = min(self.rng.randint(2, 4), max(2, n_pages - made))
            lang = self.rng.choice(_LANGS)
            base = self._base_text(lang, 120, 600).split()
            vocab = _vocab(lang)
            members: list[tuple[str, set[str], str]] = []
            url0 = self._add_page(" ".join(base), lang)
            members.append(
                (url0, shingle_set(" ".join(base), self.k), " ".join(base)))
            for _ in range(k - 1):
                mut = self._mutate(base, self.rng.randint(1, 3), vocab)
                text = " ".join(mut)
                url = self._add_page(text, lang)
                members.append((url, shingle_set(text, self.k), text))
            for (ua, sa, _), (ub, sb, _) in itertools.combinations(members, 2):
                j = jaccard(sa, sb)
                kind = "near" if j >= threshold else "decoy"
                self.corpus.truth_pairs.append(
                    {"url_a": min(ua, ub), "url_b": max(ua, ub),
                     "jaccard": j, "kind": kind})
            made += k

    def decoys(self, n_pages: int, threshold: float) -> None:
        """Heavier mutations aimed just below the threshold."""
        made = 0
        while made < n_pages:
            lang = self.rng.choice(_LANGS)
            base = self._base_text(lang, 100, 400).split()
            vocab = _vocab(lang)
            n_edit = max(3, len(base) // 6)
            mut = self._mutate(base, n_edit, vocab)
            ta, tb = " ".join(base), " ".join(mut)
            ua = self._add_page(ta, lang)
            ub = self._add_page(tb, lang)
            j = jaccard(shingle_set(ta, self.k), shingle_set(tb, self.k))
            self.corpus.truth_pairs.append(
                {"url_a": min(ua, ub), "url_b": max(ua, ub),
                 "jaccard": j, "kind": "near" if j >= threshold else "decoy"})
            made += 2

    def containment(self, n_pages: int) -> None:
        made = 0
        while made < n_pages:
            lang = self.rng.choice(_LANGS)
            inner = self._base_text(lang, 60, 150)
            pre = self._base_text(lang, 150, 400)
            post = self._base_text(lang, 150, 400)
            outer = f"{pre} {inner} {post}"
            ua = self._add_page(inner, lang)
            ub = self._add_page(outer, lang)
            self.corpus.truth_pairs.append(
                {"url_a": min(ua, ub), "url_b": max(ua, ub),
                 "jaccard": jaccard(shingle_set(inner, self.k),
                                    shingle_set(outer, self.k)),
                 "kind": "substring"})
            made += 2

    def boilerplate(self, n_pages: int, threshold: float,
                    truth_pair_limit: int) -> None:
        lang = "en"
        template = self._base_text(lang, 180, 220).split()
        vocab = _vocab(lang)
        members: list[tuple[str, set[str]]] = []
        for _ in range(n_pages):
            payload = [self.rng.choice(vocab) for _ in range(8)]
            cut = self.rng.randrange(len(template))
            text = " ".join(template[:cut] + payload + template[cut:])
            url = self._add_page(text, lang)
            members.append((url, shingle_set(text, self.k)))
        if len(members) * (len(members) - 1) // 2 <= truth_pair_limit:
            for (ua, sa), (ub, sb) in itertools.combinations(members, 2):
                j = jaccard(sa, sb)
                self.corpus.truth_pairs.append(
                    {"url_a": min(ua, ub), "url_b": max(ua, ub), "jaccard": j,
                     "kind": "near" if j >= threshold else "decoy"})

    def edge_cases(self) -> None:
        # three empty texts — one exact cluster (empty-content parity,
        # reference tests/test_utils.py:24-30,158-164)
        cid = self._next_cluster()
        for _ in range(3):
            url = self._add_page("", "en")
            self.corpus.truth_exact.append({"cluster_id": cid, "url": url})
        self._add_page("x", "en")                       # single char
        self._add_page("big " * 262_144, "en")          # ~1 MiB doc
        self._add_page("цей текст містить кирилицю і діакритику überall", "uk")
        # exact dup pair with different lang
        cid = self._next_cluster()
        t = self._base_text("en")
        for lang in ("en", "de"):
            url = self._add_page(t, lang)
            self.corpus.truth_exact.append({"cluster_id": cid, "url": url})
        # same text, different html wrapper (text-dedup joins them;
        # html differs)
        cid = self._next_cluster()
        t2 = self._base_text("en")
        u1 = self._add_page(t2, "en")
        u2 = self._add_page(t2, "en",
                            html=(b"<html><div>" + t2.encode()
                                  + b"</div></html>"))
        self.corpus.truth_exact.append({"cluster_id": cid, "url": u1})
        self.corpus.truth_exact.append({"cluster_id": cid, "url": u2})

    # -- closure --------------------------------------------------------------

    def finish(self, threshold: float) -> Corpus:
        # truth_clusters = transitive closure of exact groups + near pairs
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a: str, b: str) -> None:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

        groups: dict[int, list[str]] = {}
        for r in self.corpus.truth_exact:
            groups.setdefault(r["cluster_id"], []).append(r["url"])
        for urls in groups.values():
            for u in urls[1:]:
                union(urls[0], u)
        for p in self.corpus.truth_pairs:
            if p["kind"] == "near" and p["jaccard"] >= threshold:
                union(p["url_a"], p["url_b"])
        comp: dict[str, list[str]] = {}
        for u in list(parent):
            comp.setdefault(find(u), []).append(u)
        for i, (root, urls) in enumerate(sorted(comp.items()), 1):
            if len(urls) > 1:
                for u in urls:
                    self.corpus.truth_clusters.append(
                        {"cluster_id": i, "url": u})
        return self.corpus


def generate_corpus(n_pages: int = 2000, seed: int = 42,
                    shingle_k: int = 3, jaccard_threshold: float = 0.8,
                    truth_pair_limit: int = 200_000,
                    edge_cases: bool = True) -> Corpus:
    """Build the synthetic corpus; fully deterministic for (args)."""
    g = _Gen(seed, shingle_k)
    g.uniques(int(n_pages * 0.55))
    g.exact_groups(int(n_pages * 0.15))
    g.near_groups(int(n_pages * 0.15), jaccard_threshold)
    g.decoys(int(n_pages * 0.08), jaccard_threshold)
    g.containment(int(n_pages * 0.05))
    g.boilerplate(max(4, int(n_pages * 0.02)), jaccard_threshold,
                  truth_pair_limit)
    if edge_cases:
        g.edge_cases()
    return g.finish(jaccard_threshold)


PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def corpus_to_spark(spark, corpus: Corpus):
    """Materialize (pages_df, truth dict of DataFrames)."""
    pages = spark.createDataFrame(corpus.rows, schema=PAGES_SCHEMA)
    truth = {
        "truth_exact": spark.createDataFrame(
            corpus.truth_exact or [{"cluster_id": 0, "url": ""}],
            schema="cluster_id long, url string"),
        "truth_pairs": spark.createDataFrame(
            corpus.truth_pairs or [{"url_a": "", "url_b": "",
                                    "jaccard": 0.0, "kind": ""}],
            schema="url_a string, url_b string, jaccard double, kind string"),
        "truth_clusters": spark.createDataFrame(
            corpus.truth_clusters or [{"cluster_id": 0, "url": ""}],
            schema="cluster_id long, url string"),
    }
    return pages, truth
