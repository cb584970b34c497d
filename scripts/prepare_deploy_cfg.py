#!/usr/bin/env python3
"""Render a service config template from environment / ini values.

Counterpart of the reference's scripts/prepare_deploy_cfg.py:1-35 (a
Python-2 Jinja2 filler that builds deploy.cfg from env vars or an ini file
named by KB_DEPLOYMENT_CONFIG). This one is python-3 + stdlib only:

    python scripts/prepare_deploy_cfg.py TEMPLATE OUTPUT

Placeholders are ``{{ name }}``. Values resolve, in order:
1. environment variable ``name`` (exact, then upper-cased),
2. the ``[kmer_guts]`` section of the ini file named by
   ``KMER_DEPLOYMENT_CONFIG`` (if set),
3. error — unresolved placeholders abort with a non-zero exit, naming
   the missing keys (the reference silently rendered empty strings;
   failing loudly is deliberate).
"""
import configparser
import os
import re
import sys

PLACEHOLDER = re.compile(r"\{\{\s*([A-Za-z0-9_.-]+)\s*\}\}")


def build_lookup():
    ini = {}
    cfg_path = os.environ.get("KMER_DEPLOYMENT_CONFIG")
    if cfg_path:
        parser = configparser.ConfigParser()
        with open(cfg_path) as fh:
            parser.read_file(fh)
        if parser.has_section("kmer_guts"):
            ini = dict(parser.items("kmer_guts"))

    def lookup(name: str):
        for key in (name, name.upper()):
            if key in os.environ:
                return os.environ[key]
        return ini.get(name, ini.get(name.lower()))

    return lookup


def render(text: str, lookup) -> str:
    missing = []

    def sub(m):
        val = lookup(m.group(1))
        if val is None:
            missing.append(m.group(1))
            return ""
        return val

    out = PLACEHOLDER.sub(sub, text)
    if missing:
        raise KeyError(", ".join(sorted(set(missing))))
    return out


def main(argv) -> int:
    if len(argv) != 3:
        print(__doc__, file=sys.stderr)
        return 2
    with open(argv[1]) as fh:
        text = fh.read()
    try:
        out = render(text, build_lookup())
    except KeyError as ex:
        print(f"prepare_deploy_cfg: unresolved placeholders: {ex.args[0]}",
              file=sys.stderr)
        return 1
    with open(argv[2], "w") as fh:
        fh.write(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
