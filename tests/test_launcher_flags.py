"""jobs/*.sh launchers: every flag they pass must exist on their target CLI.

The launchers are hand-maintained shell (parity with the reference's
jobs/*.sh positional interface) and are never executed in this environment
at full scale, so a renamed or typo'd flag would otherwise only surface on
real hardware.  This parses each launcher's ``--flag`` tokens and checks
them against the target module's declared flag set (FLAGS_DEF for the absl
CLIs, argparse options for the labeler).
"""

import json
import os
import re
import subprocess
import sys

import pytest

from tests.cli_env import make_cli_env

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LAUNCHERS = {
    "train_procgen.sh": "arp_tpu.train.main",
    "train_procgen_debug.sh": "arp_tpu.train.main",
    "eval_procgen.sh": "arp_tpu.train.eval",
    "label_rewards.sh": "arp_tpu.reward.labeler",
    "finetune_clip.sh": "arp_tpu.finetune.train",
}

_ABSL_DUMP = (
    "import importlib, json, sys\n"
    "import jax; jax.config.update('jax_platforms', 'cpu')\n"
    "from ml_collections import ConfigDict\n"
    "mod = importlib.import_module(sys.argv[1])\n"
    "keys = set()\n"
    "def rec(prefix, d):\n"
    "    for kk, vv in d.items():\n"
    "        keys.add(f'{prefix}.{kk}')\n"
    "        if isinstance(vv, ConfigDict): rec(f'{prefix}.{kk}', vv)\n"
    "for k, v in dict(mod.FLAGS_DEF).items():\n"
    "    keys.add(k)\n"
    "    if isinstance(v, ConfigDict): rec(k, v)\n"
    "print(json.dumps(sorted(keys)))\n"
)


def _declared_flags(module: str) -> set:
    env = make_cli_env()
    if module == "arp_tpu.reward.labeler":
        # argparse CLI: options appear in --help output
        out = subprocess.run([sys.executable, "-m", module, "--help"], env=env,
                             capture_output=True, text=True, timeout=180)
        assert out.returncode == 0, out.stderr[-2000:]
        return set(re.findall(r"--([\w.]+)", out.stdout))
    out = subprocess.run([sys.executable, "-c", _ABSL_DUMP, module], env=env,
                         capture_output=True, text=True, timeout=180)
    assert out.returncode == 0, out.stderr[-2000:]
    return set(json.loads(out.stdout))


def test_fast_score_bf16_cli_default_is_engine_default():
    """The labeler/cache CLIs must NOT force fast_score_bf16=False when the
    flag is unset (a store_true default would silently defeat the engine's
    measured None->True default, round-4 regression): the tri-state flag
    exposes --no-fast_score_bf16 for an explicit fp32-softmax override."""
    env = make_cli_env()
    for module in ("arp_tpu.reward.labeler", "arp_tpu.data.cache_embeddings"):
        out = subprocess.run([sys.executable, "-m", module, "--help"], env=env,
                             capture_output=True, text=True, timeout=240)
        assert out.returncode == 0, out.stderr[-1500:]
        assert "--no-fast_score_bf16" in out.stdout, module
        assert "--no-fast_int8_attn" in out.stdout, module


@pytest.mark.parametrize("script,module", sorted(LAUNCHERS.items()))
def test_launcher_flags_are_declared(script, module):
    src = open(os.path.join(REPO, "jobs", script)).read()
    m = re.search(r"python3? -m (\S+)", src)
    assert m and m.group(1) == module, f"{script} launches {m and m.group(1)}"
    flags = re.findall(r"--([\w.]+)=", src)
    assert flags, f"no flags parsed from {script}"
    declared = _declared_flags(module)
    unknown = [f for f in flags if f not in declared]
    assert not unknown, f"{script} passes flags {module} does not declare: {unknown}"
