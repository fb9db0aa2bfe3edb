"""Build a Llama-3-style byte-level-BPE tokenizer asset, fully offline.

The reference serves Llama-3-8B-Instruct, whose tiktoken-style BPE has two
properties the serving engine depends on (demo/inference.py:44 asserts
``last_ids == 933``, the fused ``]\\n`` token):

  * the pre-tokenizer regex groups trailing newlines with punctuation, so
    ``]\\n`` is a single pre-token and (given a merge) a single token;
  * chat-template transition strings start at token boundaries, so the
    char-level learn ranges of tokenization_live.py resolve exactly.

This tool reproduces both with the public `tokenizers` library: the exact
Llama-3 split regex, a ByteLevel alphabet, and a BPE trained on a
deterministic corpus rich in the chat-template glue. The result is NOT the
real Llama-3 vocab (no network in this environment) — it is a structurally
faithful stand-in for integration tests and offline demos. With hub access,
point build_live_tokenizer at the genuine tokenizer instead.

  python tools/build_tokenizer.py --out assets/tokenizer/llama3_style
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Llama-3's tiktoken pattern (public: meta-llama tokenizer.model metadata /
# HF tokenizer.json pre_tokenizer Split regex).
LLAMA3_SPLIT_REGEX = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|"
    r"[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}|"
    r" ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)

BOS = "<|begin_of_text|>"
EOS = "<|eot_id|>"


def _template_corpus():
    """Deterministic training text: every chat-template transition string
    (tokenization_live.py:27-81) plus generic English so common words merge."""
    from videollm_online_tpu.core.config import live1_plus_config

    glue = [
        "]\n", "\n[", "]\nAssistant:", "]\nUser: ", "\nAssistant: ",
        "\nUser: ", ",<v>", "<v>", " [", "]", ",", ":", ".", "?", "!",
        live1_plus_config().system_prompt,
        "Please concisely narrate the video in real time.",
        "What am I doing right now?", "What should I do next?",
        "What was I doing earlier?", "...",
    ]
    words = (
        "the of and a to in is you that it he was for on are as with his "
        "they I at be this have from or one had by word but not what all "
        "were we when your can said there use an each which she do how "
        "their if will up other about out many then them these so some her "
        "would make like him into time has look two more write go see "
        "number no way could people my than first water been call who oil "
        "its now find long down day did get come made may part video frame "
        "stream assistant user system camera wearer scene action task step "
        "narrate describe current next previous watch cooking kitchen hand "
        "pick place cut wash open close start finish continue sorry wrong "
        "response last the you are doing takes holds puts looks moves"
    ).split()
    lines = []
    # repeat the glue heavily so the template transitions always win merges
    for _ in range(200):
        lines.extend(glue)
    for i in range(2000):
        w = [words[(i * 7 + j) % len(words)] for j in range(12)]
        lines.append(" ".join(w) + ".")
        lines.append("User: " + " ".join(w[:5]) + "?\nAssistant: "
                     + " ".join(w[5:]) + ".")
        lines.append("\n[<v>" + ",<v>" * (i % 9) + "]\nAssistant: "
                     + " ".join(w[:4]) + ".")
    return lines


def build(out_dir: str, vocab_size: int = 8192):
    from tokenizers import Regex, Tokenizer, decoders, models, \
        pre_tokenizers, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.Split(Regex(LLAMA3_SPLIT_REGEX), behavior="isolated",
                             invert=False),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
    ])
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size,
        special_tokens=[BOS, EOS],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator(_template_corpus(), trainer)

    os.makedirs(out_dir, exist_ok=True)
    tok.save(os.path.join(out_dir, "tokenizer.json"))

    # sanity: the engine-critical fusions
    fused = tok.encode("]\n", add_special_tokens=False).ids
    assert len(fused) == 1, f"']\\n' must fuse to one token, got {fused}"
    print(f"built {len(tok.get_vocab())}-token BPE at {out_dir} "
          f"(']\\n' = token {fused[0]})")
    return tok


def load_hf(out_dir: str):
    """Wrap the asset as a transformers fast tokenizer (bos/eos attached)."""
    from transformers import PreTrainedTokenizerFast

    return PreTrainedTokenizerFast(
        tokenizer_file=os.path.join(out_dir, "tokenizer.json"),
        bos_token=BOS, eos_token=EOS)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="assets/tokenizer/llama3_style")
    p.add_argument("--vocab_size", type=int, default=8192)
    args = p.parse_args()
    build(args.out, args.vocab_size)
