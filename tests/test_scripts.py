"""Every launch script under scripts/ must parse through core/arguments.py
and name only registered datasets (reference scripts/ tree: 10 variants —
ego4d live1/live1+/live1+_aug, narration live1/live1+/live1+_aug+ref,
lta live1/live1+, nlq live1+, coin live1+/evaluate)."""

import pathlib
import shlex

import pytest

from videollm_online_tpu.core.arguments import parse_args
from videollm_online_tpu.data.registry import available_datasets

REPO = pathlib.Path(__file__).resolve().parents[1]
SCRIPTS = sorted((REPO / "scripts").rglob("*.sh"))

# The ten reference variants (scripts/{coin,ego4d}/... in /root/reference).
EXPECTED = {
    "coin/live1+.sh", "coin/live1+_evaluate.sh",
    "ego4d/live1.sh", "ego4d/live1+.sh", "ego4d/live1+_aug.sh",
    "ego4d/narration/live1.sh", "ego4d/narration/live1+.sh",
    "ego4d/narration/live1+_aug+ref.sh",
    "ego4d/lta/live1.sh", "ego4d/lta/live1+.sh",
}


def _script_args(path: pathlib.Path):
    """Extract the CLI args passed to the python entry in a launch script."""
    text = path.read_text()
    # Join continuation lines, then take everything after the module name.
    joined = text.replace("\\\n", " ")
    for line in joined.splitlines():
        line = line.strip()
        if "videollm_online_tpu." in line and line.startswith("python"):
            toks = shlex.split(line)
            mod = next(i for i, t in enumerate(toks) if t.startswith("videollm_online_tpu."))
            args = [t for t in toks[mod + 1:] if t != '"$@"' and t != "$@"]
            return toks[mod], args
        if line.startswith("exec ") and ".sh" in line:
            # Delegating wrapper: exec "$(dirname "$0")/other.sh" --flag ...
            toks = shlex.split(line)
            target = next(t for t in toks if t.endswith(".sh"))
            target = path.parent / pathlib.Path(target).name
            extra = [t for t in toks[toks.index(next(t for t in toks if t.endswith('.sh'))) + 1:]
                     if t not in ('"$@"', "$@")]
            mod, args = _script_args(target)
            return mod, args + extra
    raise AssertionError(f"no python entry line found in {path}")


def test_all_reference_variants_present():
    rel = {str(p.relative_to(REPO / "scripts")) for p in SCRIPTS}
    missing = EXPECTED - rel
    assert not missing, f"missing launch scripts: {sorted(missing)}"


@pytest.mark.parametrize("path", SCRIPTS, ids=lambda p: str(p.relative_to(REPO / "scripts")))
def test_script_flags_resolve(path):
    module, args = _script_args(path)
    parsed = parse_args(args)
    known = set(available_datasets())
    for name in (parsed.train_datasets or []) + (parsed.eval_datasets or []):
        assert name in known, f"{path.name}: unknown dataset {name}"
    if "evaluate" in path.name:
        assert module.endswith("evaluate_entry")
    else:
        assert module.endswith("train_entry")
