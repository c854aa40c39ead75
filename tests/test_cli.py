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
        "            '--num-blocks', '1', '--max-moves', '48']\n"
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


def test_search_cfg_auto_knobs_respect_opt_outs(monkeypatch):
    """--no-fused/--no-adaptive force the portable path even when the
    backend would default the production stack on (ADVICE r2: the --loop
    path silently ignored the documented opt-outs)."""
    import argparse

    import jax

    from dream_go_tpu.cli import _search_cfg
    from dream_go_tpu.config import SearchConfig

    def args(**kw):
        ns = argparse.Namespace(ladder_features=True, no_fused=False,
                                no_adaptive=False)
        for k, v in kw.items():
            setattr(ns, k, v)
        return ns

    # CPU backend: auto resolves both knobs off
    cfg = _search_cfg(args())
    assert cfg.fused is False and cfg.adaptive is False

    # fake a tpu backend: auto resolves both knobs on, opt-outs win,
    # and each knob is defaulted independently (ADVICE r2 low finding)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cfg = _search_cfg(args())
    assert cfg.fused is True and cfg.adaptive is True
    cfg = _search_cfg(args(no_fused=True))
    assert cfg.fused is False and cfg.adaptive is True
    cfg = _search_cfg(args(no_adaptive=True))
    assert cfg.fused is True and cfg.adaptive is False
    cfg = _search_cfg(args(no_fused=True, no_adaptive=True))
    assert cfg.fused is False and cfg.adaptive is False
    # GTP-style callers keep adaptive off regardless of backend
    cfg = _search_cfg(args(), adaptive_ok=False)
    assert cfg.adaptive is False

    # explicit values passed programmatically always win over auto
    explicit = SearchConfig(fused=False, adaptive=False).resolve_auto()
    assert explicit.fused is False and explicit.adaptive is False
    assert SearchConfig().resolve_auto().fused is True
    # ladders_exact auto: exact on tpu (Pallas kernel), explicit wins
    assert SearchConfig().resolve_auto().ladders_exact is True
    assert SearchConfig(ladders_exact=False).resolve_auto() \
        .ladders_exact is False
