#!/usr/bin/env python3
"""POST generated games / models to a REST endpoint (reference
`tools/upload2rest.py` — the only cross-machine transport in the reference
pipeline).  Reads payload from stdin or --file; stdlib only."""

import argparse
import sys
import urllib.request


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("url")
    parser.add_argument("--file", help="payload file (default stdin)")
    parser.add_argument("--content-type", default="application/x-sgf")
    parser.add_argument("--date", help="X-Date header value")
    args = parser.parse_args()

    data = open(args.file, "rb").read() if args.file else sys.stdin.buffer.read()
    req = urllib.request.Request(args.url, data=data, method="POST")
    req.add_header("Content-Type", args.content_type)
    if args.date:
        req.add_header("X-Date", args.date)
    with urllib.request.urlopen(req) as resp:
        print(f"{resp.status} {resp.reason}", file=sys.stderr)
        return 0 if 200 <= resp.status < 300 else 1


if __name__ == "__main__":
    sys.exit(main())
