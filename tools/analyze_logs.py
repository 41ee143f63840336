#!/usr/bin/env python
"""Plot training curves from a work_dir train_log.jsonl
(ref: tools/analysis_tools/analyze_logs.py)."""
import argparse
import json
import os
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument('log', help='path to train_log.jsonl')
    p.add_argument('--keys', nargs='+', default=['loss'])
    p.add_argument('--out', default='curves.png')
    args = p.parse_args()

    steps, series = [], {k: [] for k in args.keys}
    with open(args.log) as f:
        for line in f:
            rec = json.loads(line)
            steps.append(rec['step'])
            for k in args.keys:
                series[k].append(rec.get(k))

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    for k, v in series.items():
        ax.plot(steps, v, label=k)
    ax.set_xlabel('step')
    ax.legend()
    fig.savefig(args.out, dpi=120, bbox_inches='tight')
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
