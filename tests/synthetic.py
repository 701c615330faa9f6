"""Synthetic tiny-dataset builders for integration tests.

Generates on-disk datasets in the reference's exact file formats (frame
lists, AVA box CSVs, EPIC annotation CSV) so the data layer is exercised
end-to-end including file parsing and JPEG decode.
"""

import os

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def write_frames(root, video_name, num_frames, size=(48, 64), seed=0,
                 pattern='frame_{:010d}.jpg'):
    """Write JPEG frames; returns relative paths. Default naming is
    EPIC-style (frame_0000000001.jpg); AVA uses '<video>_%06d.jpg'."""
    rng = np.random.RandomState(seed)
    vdir = os.path.join(root, 'frames', video_name)
    os.makedirs(vdir, exist_ok=True)
    rel_paths = []
    for i in range(num_frames):
        img = rng.randint(0, 255, size=(size[0], size[1], 3), dtype=np.uint8)
        rel = os.path.join(video_name, pattern.format(i + 1))
        cv2.imwrite(os.path.join(root, 'frames', rel), img)
        rel_paths.append(rel)
    return rel_paths


def write_frame_list(path, entries):
    """entries: (video_name, video_id, frame_id, rel_path, labels_str)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, 'w') as f:
        f.write('original_vido_id video_id frame_id path labels\n')
        for e in entries:
            f.write(' '.join(str(x) for x in e) + '\n')


def build_charades(root, num_videos=2, num_frames=40, num_classes=6):
    """Charades-style dataset; returns cfg overrides dict."""
    rng = np.random.RandomState(1)
    entries = []
    for v in range(num_videos):
        name = 'CHAR{:02d}'.format(v)
        rels = write_frames(root, name, num_frames, seed=v)
        for i, rel in enumerate(rels):
            labels = sorted(set(rng.randint(0, num_classes, size=2).tolist()))
            entries.append((name, v, i, rel,
                            '"' + ','.join(map(str, labels)) + '"'))
    write_frame_list(os.path.join(root, 'frame_lists', 'train.csv'), entries)
    write_frame_list(os.path.join(root, 'frame_lists', 'val.csv'), entries)
    return {
        'DATASET': 'charades',
        'DATADIR': os.path.join(root, 'frames'),
        'CHARADES': {'FRAME_LIST_DIR': os.path.join(root, 'frame_lists'),
                     'FPS': 24},
        'MODEL': {'NUM_CLASSES': num_classes},
    }


def build_epic(root, num_videos=2, num_frames=60, class_type='verb'):
    rng = np.random.RandomState(2)
    entries = []
    ann_rows = []
    for v in range(num_videos):
        person = 'P{:02d}'.format(v + 1 if v < 1 else 26)  # P01 train, P26 val
        name = '{}_{:02d}'.format(person, v)
        rels = write_frames(root, name, num_frames, seed=10 + v)
        for i, rel in enumerate(rels):
            entries.append((name, v, i, rel, '""'))
        # two action segments per video
        for s in range(2):
            start = 0.2 + 0.5 * s
            stop = start + 0.4
            ann_rows.append([
                str(len(ann_rows)), person, name, 'do thing',
                '00:00:{:05.2f}'.format(start), '00:00:{:05.2f}'.format(stop),
                '0', '0', 'verb', str(rng.randint(0, 5)), 'noun',
                str(rng.randint(0, 7)), '[]', '[]'])
    write_frame_list(os.path.join(root, 'frame_lists', 'train.csv'), entries)
    write_frame_list(os.path.join(root, 'frame_lists', 'val.csv'), entries)
    ann_dir = os.path.join(root, 'annotations')
    os.makedirs(ann_dir, exist_ok=True)
    with open(os.path.join(ann_dir, 'EPIC_train_action_labels.csv'), 'w') as f:
        f.write('uid,participant_id,video_id,narration,start_timestamp,'
                'stop_timestamp,start_frame,stop_frame,verb,verb_class,noun,'
                'noun_class,all_nouns,all_noun_classes\n')
        for row in ann_rows:
            f.write(','.join(row) + '\n')
    return {
        'DATASET': 'epic',
        'DATADIR': os.path.join(root, 'frames'),
        'EPIC': {'FRAME_LIST_DIR': os.path.join(root, 'frame_lists'),
                 'ANNOTATION_DIR': ann_dir, 'FPS': 30,
                 'CLASS_TYPE': class_type},
        'MODEL': {'NUM_CLASSES': 5 if class_type == 'verb' else 7,
                  'MULTI_LABEL': False},
    }


def build_ava(root, num_videos=2, num_secs=4, num_classes=80):
    """AVA-style dataset: 30fps frames covering secs 902..902+num_secs."""
    rng = np.random.RandomState(3)
    fps = 30
    entries = []
    names = []
    for v in range(num_videos):
        name = 'AVA{:02d}'.format(v)
        names.append(name)
        nframes = (num_secs + 4) * fps
        rels = write_frames(root, name, nframes, seed=20 + v,
                            pattern=name + '_{:06d}.jpg')
        for i, rel in enumerate(rels):
            entries.append((name, v, i, rel, '""'))
    write_frame_list(os.path.join(root, 'frame_lists', 'train.csv'), entries)
    write_frame_list(os.path.join(root, 'frame_lists', 'val.csv'), entries)

    ann_dir = os.path.join(root, 'annotations')
    os.makedirs(ann_dir, exist_ok=True)
    gt_rows, pred_rows = [], []
    for name in names:
        for sec in range(902, 902 + num_secs):
            for b in range(2):
                x1, y1 = rng.uniform(0, 0.4, 2)
                x2, y2 = x1 + rng.uniform(0.2, 0.5), y1 + rng.uniform(0.2, 0.5)
                box = '{:.3f},{:.3f},{:.3f},{:.3f}'.format(
                    x1, y1, min(x2, 1.0), min(y2, 1.0))
                label = rng.randint(1, num_classes + 1)
                gt_rows.append('{},{},{},{}'.format(name, sec, box, label))
                pred_rows.append('{},{},{},{},{:.2f}'.format(
                    name, sec, box, label, rng.uniform(0.85, 1.0)))
    with open(os.path.join(ann_dir, 'ava_train_v2.1.csv'), 'w') as f:
        f.write('\n'.join(gt_rows) + '\n')
    with open(os.path.join(ann_dir, 'ava_val_v2.1.csv'), 'w') as f:
        f.write('\n'.join(gt_rows) + '\n')
    for fname in ('ava_train_predicted_boxes.csv',
                  'ava_val_predicted_boxes.csv'):
        with open(os.path.join(ann_dir, fname), 'w') as f:
            f.write('\n'.join(pred_rows) + '\n')
    # Labelmap + (empty) exclusion list used by the evaluator.
    with open(os.path.join(
            ann_dir, 'ava_action_list_v2.1_for_activitynet_2018.pbtxt'),
            'w') as f:
        for cls in range(1, num_classes + 1):
            f.write('item {\n  name: "act%d"\n  id: %d\n}\n' % (cls, cls))
    open(os.path.join(ann_dir,
                      'ava_val_excluded_timestamps_v2.1.csv'), 'w').close()
    return {
        'DATASET': 'ava',
        'DATADIR': os.path.join(root, 'frames'),
        'AVA': {'FRAME_LIST_DIR': os.path.join(root, 'frame_lists'),
                'ANNOTATION_DIR': ann_dir},
        'MODEL': {'NUM_CLASSES': num_classes},
    }


def apply_overrides(cfg, overrides):
    from lfb_tpu.core.config import merge_dict_into
    merge_dict_into(cfg, overrides)
    return cfg


def make_fake_frame_lfb(db_paths, dim=16, seed=0):
    """Frame-level bank {video: {frame: feat}} for charades/epic-verb."""
    rng = np.random.RandomState(seed)
    bank = {}
    for key, paths in (db_paths.items() if isinstance(db_paths, dict)
                       else enumerate(db_paths)):
        bank[key] = {i: rng.randn(dim).astype(np.float32)
                     for i in range(0, len(paths), 5)}
    return bank
