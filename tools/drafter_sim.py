"""Host-side drafter-acceptance simulation on narration-style text.

Under forced-response replay (bench BENCH_SPEC_FORCED=narration) the
emitted token stream is the script, so spec-decode acceptance —
tokens/verify-step — is a pure function of (text, drafter), no model
needed. This script replays the SAME template-synthesized narration
scripts the bench uses (bench.synth_narration, reference text shape per
data/ego4d/narration.py:117-130) through candidate drafters to answer
"is the shipped most-recent-3-gram rule leaving acceptance on the table?"

Round-5 result (64 scripts, real BPE asset, K=7, H=2048):

  most-recent 3-gram (shipped, models/generate.py::_ngram_draft)  2.07
  longest-suffix match (M=8)                                      2.06
  frequency-voted continuation chain                              2.07
  oracle (every draft correct)                                    5.89

Acceptance on this distribution is TEXT-limited, not drafter-limited:
independently Zipf-drawn verb/object choices are unpredictable from
history, and all history-based drafters saturate at the shared-stem
prefix. (The measured 8B TPU row lands at 1.95 — the small gap to 2.07
is the per-response draft-length clipping near EOS.)

  python tools/drafter_sim.py
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

H = 2048       # history-ring length (models/generate.py SPEC_HIST)
K = 7          # drafted tokens per verify step (SPEC_DRAFT)
EOS = -1


def simulate(drafter, scripts, prompt):
    """Greedy spec-decode loop: one verify step emits 1 + accepted-prefix
    tokens (models/generate.py::ngram_speculative_generate semantics)."""
    hist: list = []
    steps = emitted = 0
    for sc in scripts:
        hist.extend(prompt)
        stream = list(sc) + [EOS]
        i = 1
        hist.append(stream[0])
        emitted += 1
        steps += 1
        while i < len(stream):
            drafts = drafter(hist, max(0, len(hist) - H))
            a = 0
            while (a < min(K, len(stream) - i) and a < len(drafts)
                   and drafts[a] == stream[i + a]):
                a += 1
            emit = min(a + 1, len(stream) - i)
            hist.extend(stream[i:i + emit])
            i += emit
            emitted += emit
            steps += 1
    return steps, emitted


def ngram3_recent(hist, lo):
    """The shipped rule: most recent earlier 3-gram match (2-gram
    fallback), propose what followed it."""
    c = len(hist)
    for n in (3, 2):
        if c < n:
            continue
        suf = hist[c - n:]
        for g in range(c - 2, lo + n - 2, -1):
            if hist[g - n + 1:g + 1] == suf:
                return hist[g + 1:g + 1 + K]
    return []


def longest_suffix(hist, lo, M=8):
    """Longest suffix agreement up to M, tie-break most recent."""
    c = len(hist)
    best_len, best_g = 0, None
    for g in range(c - 2, lo, -1):
        m = 0
        while (m < M and g - m >= lo and c - 1 - m >= 0
               and hist[g - m] == hist[c - 1 - m]):
            m += 1
        if m >= 2 and m > best_len:
            best_len, best_g = m, g
            if m == M:
                break
    return [] if best_g is None else hist[best_g + 1:best_g + 1 + K]


def majority_chain(hist, lo):
    """Per-position frequency vote over ALL 3-gram match continuations."""
    c = len(hist)
    for n in (3, 2):
        if c < n:
            continue
        suf = hist[c - n:]
        conts = [hist[g + 1:g + 1 + K] for g in range(c - 2, lo + n - 2, -1)
                 if hist[g - n + 1:g + 1] == suf]
        if conts:
            out: list = []
            for k in range(K):
                votes: dict = {}
                for ct in conts:
                    if len(ct) > k and list(ct[:k]) == out:
                        votes[ct[k]] = votes.get(ct[k], 0) + 1
                if not votes:
                    break
                out.append(max(votes.items(), key=lambda kv: kv[1])[0])
            return out
    return []


def main():
    from bench import synth_narration
    rows = synth_narration(np.random.RandomState(5), 64)
    try:
        import build_tokenizer
        hf = build_tokenizer.load_hf(
            os.path.join(REPO, "assets", "tokenizer", "llama3_style"))
        enc = lambda s: hf(s, add_special_tokens=False)["input_ids"]
        prompt = enc("\nAssistant:")
        print("tokenizer: real BPE asset")
    except Exception:
        enc = lambda s: list(s.encode())
        prompt = enc("\nAssistant:")
        print("tokenizer: byte fallback")
    scripts = [enc(s) for s in rows]

    for name, d in [("most-recent 3-gram (shipped)", ngram3_recent),
                    ("longest-suffix (M=8)", longest_suffix),
                    ("frequency-voted chain", majority_chain)]:
        s, e = simulate(d, scripts, prompt)
        print(f"{name:32s} {s:4d} steps -> {e} tokens = "
              f"{e / s:.2f} tokens/step")
    tot = sum(len(sc) + 1 for sc in scripts)
    osteps = sum(math.ceil((len(sc) + 1) / (K + 1)) for sc in scripts)
    print(f"{'oracle (all drafts correct)':32s} {osteps:4d} steps -> "
          f"{tot} tokens = {tot / osteps:.2f} tokens/step")


if __name__ == "__main__":
    main()
