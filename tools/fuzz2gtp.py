#!/usr/bin/env python3
"""GTP fuzzer / endless self-play over GTP (reference `tools/fuzz2gtp.py`):
drives a GTP engine subprocess with random mixed commands and alternating
genmoves, checking that every response is well-formed.

Usage: fuzz2gtp.py [--moves N] [--seed S] -- <engine command...>
With no engine command, drives the in-process engine.
"""

import random
import subprocess
import sys

sys.path.insert(0, "/root/repo")


class InProcess:
    def __init__(self):
        import jax
        jax.config.update("jax_platforms", "cpu")
        from dream_go_tpu.config import SearchConfig
        from dream_go_tpu.gtp.engine import GtpEngine
        from dream_go_tpu.mcts.predictor import random_predictor
        self.engine = GtpEngine(random_predictor(), SearchConfig(),
                                num_rollout=8)

    def ask(self, line):
        resp, _ = self.engine.handle(line)
        return resp.strip()


class Subproc:
    def __init__(self, cmd):
        self.proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                                     stdout=subprocess.PIPE, text=True)

    def ask(self, line):
        self.proc.stdin.write(line + "\n")
        self.proc.stdin.flush()
        out = []
        while True:
            got = self.proc.stdout.readline()
            if got.strip() == "" and out:
                break
            out.append(got.rstrip("\n"))
        return "\n".join(out)


def main():
    args = sys.argv[1:]
    moves, seed = 60, 0
    if "--moves" in args:
        moves = int(args[args.index("--moves") + 1])
    if "--seed" in args:
        seed = int(args[args.index("--seed") + 1])
    engine = Subproc(args[args.index("--") + 1:]) if "--" in args \
        else InProcess()
    rng = random.Random(seed)

    chatter = ["name", "version", "protocol_version", "list_commands",
               "showboard", "komi 7.5", "known_command genmove",
               "gomill-cpu_time", "boardsize 19"]
    failures = 0
    engine.ask("clear_board")
    color = "black"
    for i in range(moves):
        if rng.random() < 0.3:
            resp = engine.ask(rng.choice(chatter))
            if not (resp.startswith("=") or resp.startswith("?")):
                print(f"MALFORMED: {resp!r}", file=sys.stderr)
                failures += 1
        resp = engine.ask(f"genmove {color}")
        if not resp.startswith("="):
            print(f"genmove failed: {resp!r}", file=sys.stderr)
            failures += 1
        color = "white" if color == "black" else "black"
    print(f"fuzzed {moves} genmoves, {failures} failures", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
