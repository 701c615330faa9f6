#!/usr/bin/env python
"""EPIC-Kitchens action evaluation (CLI-compatible with the reference
``tools/evaluate_actions.py``): combine verb and noun predictions into
action top-k accuracy.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FORMAT = '[%(levelname)s: %(filename)s: %(lineno)4d]: %(message)s'
logging.basicConfig(level=logging.INFO, format=FORMAT, stream=sys.stdout)


def main():
    parser = argparse.ArgumentParser(
        description='EPIC-Kitchens Action Evaluation')
    parser.add_argument('--verb_file', type=str, required=True)
    parser.add_argument('--noun_file', type=str, required=True)
    parser.add_argument('--annotation_root', type=str,
                        default='data/epic/annotations')
    parser.add_argument('--num_seg', type=int, default=None,
                        help='Validation segment count (default: the '
                             'official 5,281; override for subsets)')
    args = parser.parse_args()

    from lfb_tpu.eval.epic_actions import NUM_TEST_SEG, evaluate_actions
    evaluate_actions(args.verb_file, args.noun_file, args.annotation_root,
                     num_seg=(args.num_seg if args.num_seg is not None
                              else NUM_TEST_SEG))


if __name__ == '__main__':
    main()
