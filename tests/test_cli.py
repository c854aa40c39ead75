"""CLI front-end smoke over a real subprocess (`src/dg/main.rs:31-90`
procedure dispatch): the production --self-play path emits valid big-SGF
lines with search annotations and winrate-scaled rollout counts."""

import re
import subprocess
import sys


def test_cli_self_play_emits_annotated_sgf():
    code = (
        "import sys; sys.path.insert(0, {repo!r})\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "sys.argv = ['dg', '--self-play', '2', '--num-rollout', '12',\n"
        "            '--num-games', '2', '--num-channels', '16',\n"
        "            '--num-blocks', '1']\n"
        "from dream_go_tpu.cli import main\n"
        "main()\n"
    ).format(repo=_repo())
    p = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=540)
    assert p.returncode == 0, p.stderr[-2000:]
    lines = [l for l in p.stdout.splitlines() if l.startswith("(;")]
    assert len(lines) == 2
    from dream_go_tpu.utils import sgf
    for line in lines:
        game = sgf.parse_line(line)
        assert game is not None and len(game.moves) > 0
    tv = [int(x) for x in re.findall(r"TV\[(\d+)\]", lines[0])]
    assert tv and max(tv) <= 12    # budgets never exceed num_rollout
    assert "P[" in lines[0]        # search distributions recorded


def _repo():
    import dream_go_tpu
    return next(iter(dream_go_tpu.__path__)).rsplit("/", 1)[0]


def test_cli_print_tensor_statistics(tmp_path, capsys):
    """`--print` parity (`dream_tf/__main__.py:246-268`): without names a
    JSON {tensor: {mean, std}} map; with names the raw values."""
    import json

    import jax

    from dream_go_tpu.cli import main
    from dream_go_tpu.config import ModelConfig
    from dream_go_tpu.models import params as MP
    from dream_go_tpu.models import tower as T

    cfg = ModelConfig(num_channels=8, num_blocks=1, num_samples=2)
    params, stats = T.init_tower(cfg, jax.random.PRNGKey(0))
    path = tmp_path / "w.json"
    path.write_text(MP.dump_json(cfg, params, stats))

    main(["--print", "--weights", str(path)])
    out = json.loads(capsys.readouterr().out)
    assert "01_upsample/conv_1:0" in out
    for entry in out.values():
        assert set(entry) == {"mean", "std"}

    main(["--print", "num_channels:0", "--weights", str(path)])
    text = capsys.readouterr().out
    assert text.startswith("num_channels:0") and "8" in text
