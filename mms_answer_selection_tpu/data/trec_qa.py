"""TREC-QA data preparation: XML -> packed index arrays.

Reproduces the semantics of the reference driver's ``make_data``
(do_trec_qa_clean.py:75-320) -- the parsing rules, vocab construction,
IDF/overlap features, and center-padding -- while replacing its HDF5-chunk
output with npz arrays (the TPU input path wants contiguous host arrays it
can slice and ship, not a chunked-file emulation).

Semantics checklist (all cited):
* XML walk: qid from ``<QApairs id='...'>``; the line after ``<question>``
  is the tab-tokenized lowercased question; a line whose *previous* line is
  ``<positive>``/``<negative>`` is an answer with that label; answers longer
  than 60 tokens are skipped (:116-150)
* vocab = corpus∩GloVe words in *corpus iteration order*, then two extra
  indices: unknown = n, pad = n+1, vocab size n+2 (:278-301)
* IDF over train answers + per-qid-unique train questions:
  df[w] = log(num_docs / doc_freq) (:152-160, 306-313)
* overlap features per pair: [|Q∩A| / (|Qset|+|Aset|),
  idf_overlap / (|Qset|+|Aset|)] with 11.0 for OOV-idf words (:162-182)
* encoding: per-token index (unknown for OOV), truncate to maxlen, then
  CENTER pad with the pad index: pad_before = (maxlen-len)//2 (:184-203)
* group ids: dense re-index of qids via list(set(qids)).index -- order is
  arbitrary-but-fixed; here the deterministic first-appearance order is
  used (:212-213).  Metrics never depend on the id values themselves.
"""

from __future__ import annotations

import math
import os
import re
from collections import OrderedDict, defaultdict

import numpy as np

QID_RE = re.compile(r"<QApairs id='(.*)'>")
LABEL_RE = re.compile(r"^<(positive|negative)>")
MAX_ANSWER_TOKENS = 60  # answers longer than this are skipped (:139-141)


def parse_trec_xml(path_or_text: str):
    """Returns (qids, questions, answers, labels); tokens are lowercased
    tab-split lists, mirroring load_data (do_trec_qa_clean.py:116-150)."""
    if os.path.exists(path_or_text):
        with open(path_or_text, encoding="utf-8", errors="replace") as f:
            lines = f.readlines()
    else:
        lines = path_or_text.splitlines(keepends=True)
    qids, questions, answers, labels = [], [], [], []
    prev = ""
    qid = None
    question: list[str] = []
    for raw in lines:
        line = raw.strip()
        m = QID_RE.match(line)
        if m:
            qid = m.group(1)
        if prev and prev.startswith("<question>"):
            question = line.lower().split("\t")
        lm = LABEL_RE.match(prev)
        if lm:
            answer = line.lower().split("\t")
            if len(answer) > MAX_ANSWER_TOKENS:
                prev = line
                continue
            labels.append(1 if lm.group(1) == "positive" else 0)
            answers.append(answer)
            questions.append(question)
            qids.append(qid)
        prev = line
    return qids, questions, answers, labels


def compute_dfs(docs):
    """word -> log(num_docs / doc_freq) (do_trec_qa_clean.py:152-160)."""
    word2df = defaultdict(float)
    for doc in docs:
        for w in set(doc):
            word2df[w] += 1.0
    num_docs = len(docs)
    return {w: math.log(num_docs / v) for w, v in word2df.items()}


def compute_overlap_features(questions, answers, *, word2df=None,
                             stoplist=None):
    """(n, 2) float array (do_trec_qa_clean.py:162-182)."""
    word2df = word2df or {}
    stoplist = set(stoplist or ())
    feats = np.zeros((len(questions), 2), np.float32)
    for i, (q, a) in enumerate(zip(questions, answers)):
        q_set = {w for w in q if w not in stoplist}
        a_set = {w for w in a if w not in stoplist}
        overlap = q_set & a_set
        df_overlap = sum(word2df.get(w, 11.0) for w in overlap)
        denom = len(q_set) + len(a_set)
        feats[i] = (len(overlap) / denom, df_overlap / denom)
    return feats


def build_vocab(all_words, w2v: dict):
    """Returns (word->index OrderedDict over corpus∩w2v, unknown_idx,
    pad_idx, vocab_size, pretrained (n, D) array in index order).

    The pretrained array is exactly what the reference writes to
    wiki_dict.txt and the Embed layer reloads into rows [0, n)
    (do_trec_qa_clean.py:283-289; embed_layer.cpp:52-62)."""
    index = OrderedDict()
    rows = []
    for word in all_words:
        if word in w2v and word not in index:
            index[word] = len(index)
            rows.append(np.asarray(w2v[word], np.float32))
    n = len(index)
    pretrained = np.stack(rows) if rows else np.zeros((0, 0), np.float32)
    return index, n, n + 1, n + 2, pretrained


def encode_tokens(tokens, vocab, unknown_idx, pad_idx, maxlen):
    """Center-pad/truncate to maxlen (do_trec_qa_clean.py:184-203)."""
    ids = [vocab.get(t, unknown_idx) for t in tokens]
    slen = len(tokens)
    pad_b = max(0, (maxlen - slen) // 2)
    pad_a = max(0, maxlen - pad_b - slen)
    out = [pad_idx] * pad_b + ids[:maxlen] + [pad_idx] * pad_a
    assert len(out) == maxlen
    return out


def encode_split(qids, questions, answers, labels, vocab, unknown_idx,
                 pad_idx, *, q_len=40, a_len=40, word2df=None, stoplist=None):
    """One split -> dict of arrays {question, answer, label, group,
    overlap_feat} (the HDF5 tops of do_trec_qa_clean.py:236-246)."""
    seen: dict[str, int] = {}
    groups = np.asarray([seen.setdefault(q, len(seen)) for q in qids],
                        np.int32)
    q_arr = np.asarray(
        [encode_tokens(q, vocab, unknown_idx, pad_idx, q_len)
         for q in questions], np.int32)
    a_arr = np.asarray(
        [encode_tokens(a, vocab, unknown_idx, pad_idx, a_len)
         for a in answers], np.int32)
    feats = compute_overlap_features(questions, answers, word2df=word2df,
                                     stoplist=stoplist)
    return {
        "question": q_arr,
        "answer": a_arr,
        "label": np.asarray(labels, np.int32),
        "group": groups,
        "overlap_feat": feats,
    }


def prepare_trec_qa(train_xml, dev_xml, test_xml, w2v: dict, *, q_len=40,
                    a_len=40, stoplist=None):
    """Full data prep: three splits + vocab artifacts.

    Returns (splits, vocab_info) where splits = {'train','dev','test'} dicts
    and vocab_info = {'vocab', 'unknown_idx', 'pad_idx', 'vocab_size',
    'pretrained', 'word2df'}.  Mirrors make_data's vocabulary over ALL
    splits' words (:253-261) and IDF over train answers + unique train
    questions (:306-313)."""
    tr = parse_trec_xml(train_xml)
    dv = parse_trec_xml(dev_xml)
    te = parse_trec_xml(test_xml)

    all_words_iter = []
    for split in (tr, dv, te):
        for sent in split[1] + split[2]:
            all_words_iter.extend(sent)
    # set semantics for membership; first-appearance order for determinism
    seen = OrderedDict((w, None) for w in all_words_iter)
    vocab, unknown_idx, pad_idx, vocab_size, pretrained = build_vocab(
        seen.keys(), w2v)

    qids_tr, questions_tr, _, _ = tr
    uniq_seen = set()
    unique_questions = []
    for q, qid in zip(questions_tr, qids_tr):
        if qid not in uniq_seen:
            uniq_seen.add(qid)
            unique_questions.append(q)
    word2df = compute_dfs(tr[2] + unique_questions)

    splits = {}
    for name, (qids, qs, ans, labels) in (("train", tr), ("dev", dv),
                                          ("test", te)):
        splits[name] = encode_split(qids, qs, ans, labels, vocab, unknown_idx,
                                    pad_idx, q_len=q_len, a_len=a_len,
                                    word2df=word2df, stoplist=stoplist)
    vocab_info = {"vocab": vocab, "unknown_idx": unknown_idx,
                  "pad_idx": pad_idx, "vocab_size": vocab_size,
                  "pretrained": pretrained, "word2df": word2df}
    return splits, vocab_info


def save_dataset(path: str, split: dict):
    np.savez_compressed(path, **split)


def load_dataset(path: str) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


# ---------------------------------------------------------------------------
# synthetic fixtures (the generate_sample_data.py analogue,
# src/caffe/test/test_data/generate_sample_data.py)
# ---------------------------------------------------------------------------

def synthetic_corpus(n_questions=12, answers_per_q=6, vocab_words=80, dim=50,
                     seed=0):
    """Generate a TREC-QA-format XML string + a GloVe-style w2v dict with a
    plantable signal: positive answers share content words with their
    question.  Lets the E2E pipeline (parse -> vocab -> train -> eval) run
    hermetically in tests."""
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab_words)]
    w2v = {w: rng.normal(scale=0.3, size=dim).astype(np.float32).tolist()
           for w in words[: int(vocab_words * 0.85)]}  # some OOV words
    lines = []
    for qi in range(n_questions):
        content = rng.choice(vocab_words, size=4, replace=False)
        q_tokens = [words[c] for c in content]
        lines.append(f"<QApairs id='{qi + 1}.{qi}'>")
        lines.append("<question>")
        lines.append("\t".join(q_tokens))
        lines.append("</question>")
        for ai in range(answers_per_q):
            pos = ai < max(1, answers_per_q // 3)
            if pos:
                toks = q_tokens[:2] + [words[int(c)] for c in
                                       rng.choice(vocab_words, size=3)]
            else:
                toks = [words[int(c)] for c in rng.choice(vocab_words, size=5)]
            tag = "positive" if pos else "negative"
            lines.append(f"<{tag}>")
            lines.append("\t".join(toks))
            lines.append(f"</{tag}>")
        lines.append("</QApairs>")
    return "\n".join(lines), w2v
