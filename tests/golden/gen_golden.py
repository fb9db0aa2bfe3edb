"""Generate golden chat-template/learn-range fixtures by EXECUTING the
reference implementation at /root/reference (read-only). The JSON outputs are
committed; tests compare our pure-Python re-implementation against them.

Run: python tests/golden/gen_golden.py
"""

import importlib.util
import json
import os
import sys
import types

REF = os.environ.get("REFERENCE_PATH", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "chat_golden.json")


def load_ref_module(name, path, package="refmodels"):
    spec = importlib.util.spec_from_file_location(f"{package}.{name}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"{package}.{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    pkg = types.ModuleType("refmodels")
    pkg.__path__ = [os.path.join(REF, "models")]
    sys.modules["refmodels"] = pkg
    cfg_mod = load_ref_module("configuration_live",
                              os.path.join(REF, "models/configuration_live.py"))
    tok_mod = load_ref_module("tokenization_live",
                              os.path.join(REF, "models/tokenization_live.py"))

    class StubTok:
        bos_token = "<bos>"
        eos_token = "<eos>"

    cases = []
    conversations = [
        [
            {"role": "system", "content": "cool."},
            {"role": "stream", "num_frames": 2, "learn": 1},
            {"role": "user", "content": "cool?"},
            {"role": "assistant", "content": "cool.", "learn": True},
            {"role": "stream", "num_frames": 3, "learn": 3},
            {"role": "assistant", "content": "so cool.", "learn": True},
        ],
        [
            {"role": "system", "content": "sys prompt here."},
            {"role": "stream", "num_frames": 5, "learn": True},
            {"role": "assistant", "content": "I see you picking a cup.", "learn": True},
            {"role": "stream", "num_frames": 1, "learn": True},
            {"role": "user", "content": "what next?"},
            {"role": "assistant", "content": "pour water.", "learn": True},
            {"role": "user", "content": "thanks"},
            {"role": "user", "content": "really"},
            {"role": "stream", "num_frames": 4, "learn": False},
        ],
    ]
    presets = {
        "live1plus": dict(frame_token_interval=",", frame_token_cls=True,
                          frame_token_pooled=[3, 3], frame_num_tokens=10),
        "live1": dict(frame_token_interval="", frame_token_cls=True,
                      frame_token_pooled=None, frame_num_tokens=1),
    }
    for preset_name, kw in presets.items():
        model_config = cfg_mod.LiveConfigMixin(**kw)
        offsets = tok_mod.chat_template_offsets(StubTok())
        for ci, conv in enumerate(conversations):
            ranges = tok_mod.get_learn_ranges(
                conv, chat_template_offsets=offsets, model_config=model_config)
            # render via the jinja template through a minimal jinja env
            import jinja2
            env = jinja2.Environment()
            tpl_str = tok_mod.chat_template(
                StubTok(), tok_mod.get_stream_placeholder_jinja2(model_config))
            tpl = env.from_string(tpl_str)
            text = tpl.render(messages=conv, bos_token=StubTok.bos_token,
                              eos_token=StubTok.eos_token,
                              add_generation_prompt=False,
                              add_stream_prompt=False,
                              add_stream_query_prompt=False,
                              add_stream_generation_prompt=False)
            cases.append({
                "preset": preset_name,
                "conversation": conv,
                "text": text,
                "learn_ranges": [[r.start, r.stop] for r in ranges],
            })
        # prompt-extension flags on a single-message render
        for flags in (dict(add_generation_prompt=True),
                      dict(add_stream_prompt=True),
                      dict(add_stream_generation_prompt=True),
                      dict(add_stream_query_prompt=True)):
            conv = [{"role": "user", "content": "hi"}]
            import jinja2
            env = jinja2.Environment()
            tpl = env.from_string(tok_mod.chat_template(
                StubTok(), tok_mod.get_stream_placeholder_jinja2(model_config)))
            defaults = dict(add_generation_prompt=False, add_stream_prompt=False,
                            add_stream_query_prompt=False,
                            add_stream_generation_prompt=False)
            defaults.update(flags)
            text = tpl.render(messages=conv, bos_token=StubTok.bos_token,
                              eos_token=StubTok.eos_token, **defaults)
            cases.append({"preset": preset_name, "conversation": conv,
                          "flags": flags, "text": text, "learn_ranges": None})

    with open(OUT, "w") as f:
        json.dump(cases, f, indent=1)
    print(f"wrote {len(cases)} cases to {OUT}")


if __name__ == "__main__":
    main()
