#!/usr/bin/env python
"""Dataset preparation: download annotations / cut videos / extract frames.

One consolidated tool replacing the reference's five shell scripts under
``dataset_tools/`` (reference ``dataset_tools/ava/*.sh``,
``dataset_tools/epic/extract_epic_frames.sh``), with identical processing
parameters:

  AVA:  videos cut to minutes 15-30 (ffmpeg -ss 900 -t 901), frames
        extracted at 30 fps q=1; annotations fetched from
        research.google.com/ava.
  EPIC: frames extracted at 30 fps, short side 340, q=1.

Usage:
  python tools/prepare_data.py ava-annotations  [--data_root data/ava]
  python tools/prepare_data.py ava-videos       [--data_root data/ava]
  python tools/prepare_data.py ava-cut          [--data_root data/ava]
  python tools/prepare_data.py ava-frames       [--data_root data/ava]
  python tools/prepare_data.py epic-frames      [--data_root data/epic]
"""

import argparse
import os
import subprocess
import sys

AVA_ANNOTATION_URLS = [
    'https://research.google.com/ava/download/ava_train_v2.1.csv',
    'https://research.google.com/ava/download/ava_val_v2.1.csv',
    'https://research.google.com/ava/download/'
    'ava_action_list_v2.1_for_activitynet_2018.pbtxt',
    'https://research.google.com/ava/download/'
    'ava_train_excluded_timestamps_v2.1.csv',
    'https://research.google.com/ava/download/'
    'ava_val_excluded_timestamps_v2.1.csv',
]
AVA_FILE_LIST_URL = ('https://s3.amazonaws.com/ava-dataset/annotations/'
                     'ava_file_names_trainval_v2.1.txt')
AVA_VIDEO_BASE = 'https://s3.amazonaws.com/ava-dataset/trainval/'


def run(cmd, **kw):
    print('+', ' '.join(cmd))
    subprocess.run(cmd, check=True, **kw)


def video_stem(filename):
    base = os.path.basename(filename)
    return base[:-5] if base.endswith('.webm') else os.path.splitext(base)[0]


def ava_annotations(root):
    out = os.path.join(root, 'annotations')
    os.makedirs(out, exist_ok=True)
    for url in AVA_ANNOTATION_URLS:
        run(['wget', '-nc', url, '-P', out])
    print('NOTE: lfb_tpu ships its own AVA Pascal-mAP evaluator '
          '(lfb_tpu/eval/ava_eval.py); no ActivityNet checkout is needed.')


def ava_videos(root):
    out = os.path.join(root, 'videos')
    os.makedirs(out, exist_ok=True)
    run(['wget', '-nc', AVA_FILE_LIST_URL])
    with open('ava_file_names_trainval_v2.1.txt') as f:
        for line in f:
            name = line.strip()
            if name:
                run(['wget', '-nc', AVA_VIDEO_BASE + name, '-P', out])


def ava_cut(root):
    """Cut each video to its 15th-30th minute."""
    in_dir = os.path.join(root, 'videos')
    out_dir = os.path.join(root, 'videos_15min')
    os.makedirs(out_dir, exist_ok=True)
    for name in sorted(os.listdir(in_dir)):
        dst = os.path.join(out_dir, name)
        if os.path.exists(dst):
            continue
        run(['ffmpeg', '-ss', '900', '-t', '901',
             '-i', os.path.join(in_dir, name), dst])


def ava_frames(root):
    in_dir = os.path.join(root, 'videos_15min')
    out_dir = os.path.join(root, 'frames')
    for name in sorted(os.listdir(in_dir)):
        stem = video_stem(name)
        vdir = os.path.join(out_dir, stem)
        os.makedirs(vdir, exist_ok=True)
        run(['ffmpeg', '-i', os.path.join(in_dir, name), '-r', '30',
             '-q:v', '1', os.path.join(vdir, stem + '_%06d.jpg')])


def epic_frames(root):
    in_dir = os.path.join(root, 'videos')
    out_dir = os.path.join(root, 'frames')
    for name in sorted(os.listdir(in_dir)):
        stem = video_stem(name)
        vdir = os.path.join(out_dir, stem)
        os.makedirs(vdir, exist_ok=True)
        run(['ffmpeg', '-i', os.path.join(in_dir, name),
             '-vf', 'scale=-1:340', '-r', '30', '-q:v', '1',
             os.path.join(vdir, 'frame_%010d.jpg')])


COMMANDS = {
    'ava-annotations': (ava_annotations, 'data/ava'),
    'ava-videos': (ava_videos, 'data/ava'),
    'ava-cut': (ava_cut, 'data/ava'),
    'ava-frames': (ava_frames, 'data/ava'),
    'epic-frames': (epic_frames, 'data/epic'),
}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('command', choices=sorted(COMMANDS))
    parser.add_argument('--data_root', type=str, default=None)
    args = parser.parse_args()
    fn, default_root = COMMANDS[args.command]
    fn(args.data_root or default_root)


if __name__ == '__main__':
    main()
