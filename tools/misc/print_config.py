#!/usr/bin/env python
"""Print the fully-resolved config (ref: tools/misc/print_config.py —
loads the config, resolves _base_ inheritance, pretty-prints).

Usage: python tools/misc/print_config.py CONFIG
"""
import argparse
import os
import pprint
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    args = p.parse_args()
    from tpu_bev3d.config import Config
    cfg = Config.fromfile(args.config)
    print(f'Config read from {args.config}:')
    pprint.pprint(dict(cfg), width=79, sort_dicts=False)


if __name__ == '__main__':
    main()
