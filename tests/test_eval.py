import os

import numpy as np
import pytest

from lfb_tpu.eval import ava_eval
from lfb_tpu.eval.metrics import (MetricsCalculator, get_ava_mini_groundtruth,
                                  mean_ap_metric, topk_correct)
from lfb_tpu.eval import epic_actions, multicrop
from lfb_tpu.core import config as C


# ----------------------------------------------------------------------- #
# AP / mAP
# ----------------------------------------------------------------------- #

def test_compute_average_precision_golden():
    # 4 detections sorted by score: TP, FP, TP, FP against 2 GT.
    tp = np.array([1, 0, 1, 0], float)
    cum = np.cumsum(tp)
    recall = cum / 2
    precision = cum / np.arange(1, 5)
    ap = ava_eval.compute_average_precision(precision, recall)
    # envelope: p=[1, 2/3, 2/3, .5] -> recall steps at .5 (p=1), 1.0 (p=2/3)
    assert abs(ap - (0.5 * 1.0 + 0.5 * (2 / 3))) < 1e-9


def test_pascal_map_perfect_and_miss():
    gt_boxes = {'v,0902': [[0.0, 0.0, 0.5, 0.5], [0.5, 0.5, 1.0, 1.0]]}
    gt_labels = {'v,0902': [1, 2]}
    gt = (gt_boxes, gt_labels, None)
    categories = [{'id': 1, 'name': 'a'}, {'id': 2, 'name': 'b'}]

    # perfect detections
    dt = ({'v,0902': [[0.0, 0.0, 0.5, 0.5], [0.5, 0.5, 1.0, 1.0]]},
          {'v,0902': [1, 2]}, {'v,0902': [0.9, 0.8]})
    m = ava_eval.pascal_map(gt, dt, set(), categories)
    assert abs(m['PascalBoxes_Precision/mAP@0.5IOU'] - 1.0) < 1e-9

    # class 2 detection misses (IoU < 0.5)
    dt2 = ({'v,0902': [[0.0, 0.0, 0.5, 0.5], [0.0, 0.0, 0.2, 0.2]]},
           {'v,0902': [1, 2]}, {'v,0902': [0.9, 0.8]})
    m2 = ava_eval.pascal_map(gt, dt2, set(), categories)
    assert abs(m2['PascalBoxes_Precision/mAP@0.5IOU'] - 0.5) < 1e-9


def test_pascal_map_greedy_matching_and_duplicates():
    # Two detections on one GT: higher-score matches, duplicate is FP.
    gt = ({'v,0902': [[0.0, 0.0, 1.0, 1.0]]}, {'v,0902': [1]}, None)
    dt = ({'v,0902': [[0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 0.95, 0.95]]},
          {'v,0902': [1, 1]}, {'v,0902': [0.6, 0.9]})
    m = ava_eval.pascal_map(gt, dt, set(),
                            [{'id': 1, 'name': 'a'}])
    # higher score (0.9, IoU~0.9) claims the GT; 0.6 is duplicate FP
    # recall [1], precision [1, .5] -> AP = 1.0
    assert abs(m['PascalBoxes_Precision/mAP@0.5IOU'] - 1.0) < 1e-9


def test_pascal_map_excluded_keys():
    gt = ({'v,0902': [[0, 0, 1, 1]], 'v,0904': [[0, 0, 1, 1]]},
          {'v,0902': [1], 'v,0904': [1]}, None)
    dt = ({'v,0904': [[0, 0, 1, 1]]}, {'v,0904': [1]}, {'v,0904': [0.9]})
    m = ava_eval.pascal_map(gt, dt, {'v,0902'}, [{'id': 1, 'name': 'a'}])
    assert abs(m['PascalBoxes_Precision/mAP@0.5IOU'] - 1.0) < 1e-9


def test_ava_eval_data_format():
    scores = np.array([[0.7, 0.2]])
    boxes = np.array([[0.0, 0.1, 0.2, 0.3, 0.4]])  # [batch, x1, y1, x2, y2]
    metadata = np.array([[0.0, 905.0, 48, 64]])
    out_boxes, out_labels, out_scores = ava_eval.get_ava_eval_data(
        scores, boxes, metadata, {1, 2}, {0: 'vid'})
    key = 'vid,0905'
    assert out_labels[key] == [1, 2]
    # y1,x1,y2,x2 ordering
    np.testing.assert_allclose(out_boxes[key][0], [0.2, 0.1, 0.4, 0.3])
    np.testing.assert_allclose(out_scores[key], [0.7, 0.2])


def test_read_csv_and_exclusions(tmp_path):
    p = tmp_path / 'gt.csv'
    p.write_text('vid,902,0.1,0.2,0.3,0.4,5\nvid,902,0.1,0.2,0.3,0.4,99\n')
    boxes, labels, scores = ava_eval.read_csv(str(p), class_whitelist={5})
    assert labels['vid,0902'] == [5]
    np.testing.assert_allclose(boxes['vid,0902'][0], [0.2, 0.1, 0.4, 0.3])

    e = tmp_path / 'ex.csv'
    e.write_text('vid,0902\n')
    assert ava_eval.read_exclusions(str(e)) == {'vid,0902'}


def test_read_labelmap(tmp_path):
    p = tmp_path / 'lm.pbtxt'
    p.write_text('item {\n  name: "walk"\n  id: 1\n}\n'
                 'item {\n  name: "run"\n  label_id: 7\n}\n')
    labelmap, ids = ava_eval.read_labelmap(str(p))
    assert ids == {1, 7}
    assert labelmap[0] == {'id': 1, 'name': 'walk'}


# ----------------------------------------------------------------------- #
# metrics calculator
# ----------------------------------------------------------------------- #

def test_topk_correct():
    preds = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    labels = np.array([1, 2])
    assert topk_correct(preds, labels, 1) == 1
    assert topk_correct(preds, labels, 2) == 1
    assert topk_correct(preds, labels, 3) == 2


def test_mean_ap_matches_sklearn():
    import sklearn.metrics as skm
    rng = np.random.RandomState(0)
    targets = (rng.rand(20, 5) > 0.6).astype(float)
    targets[:, 3] = 0  # empty class dropped
    preds = rng.rand(20, 5)
    auc, mAP, wAP, aps = mean_ap_metric(preds, targets)
    keep = ~np.all(targets == 0, axis=0)
    ref = skm.average_precision_score(targets[:, keep], preds[:, keep],
                                      average=None)
    np.testing.assert_allclose(aps[keep], ref)
    assert aps[3] == 0


def test_charades_clip_aggregation():
    cfg = C.finalize(C.default_config())
    cfg.DATASET = 'charades'
    cfg.MODEL.MULTI_LABEL = True
    cfg.MODEL.NUM_CLASSES = 3
    cfg.TEST.DATASET_SIZE = 2  # 2 videos
    mc = MetricsCalculator(cfg, 'val', num_test_clips=2)
    labels = np.array([[1, 0, 0], [0, 1, 0]], float)
    # clip 0 preds then clip 1 preds (row v + c*num_videos)
    mc.update_test(np.array([[0.1, 0.5, 0.2], [0.3, 0.2, 0.1]]),
                   labels)
    mc.update_test(np.array([[0.4, 0.1, 0.6], [0.2, 0.9, 0.0]]),
                   labels)
    preds, labs = mc.aggregate_predictions_from_clips()
    np.testing.assert_allclose(preds, [[0.4, 0.5, 0.6], [0.3, 0.9, 0.1]])
    assert labs.shape == (2, 3)


def test_ava_mini_groundtruth():
    from collections import defaultdict
    full = [defaultdict(list) for _ in range(3)]
    full[0]['v,0902'] = [1]
    full[0]['v,0904'] = [2]
    mini = get_ava_mini_groundtruth(full)
    assert 'v,0904' in mini[0] and 'v,0902' not in mini[0]


# ----------------------------------------------------------------------- #
# EPIC action combination
# ----------------------------------------------------------------------- #

def test_epic_action_topk(tmp_path):
    import pickle
    n = 4
    verb_pred = np.eye(3)[np.array([0, 1, 2, 0])] * 5.0
    noun_pred = np.eye(4)[np.array([1, 2, 3, 0])] * 5.0
    verb_labels = np.array([0, 1, 2, 1])
    noun_labels = np.array([1, 2, 3, 0])
    with open(tmp_path / 'verb.pkl', 'wb') as f:
        pickle.dump((verb_pred, verb_labels), f, protocol=2)
    with open(tmp_path / 'noun.pkl', 'wb') as f:
        pickle.dump((noun_pred, noun_labels), f, protocol=2)
    ann = tmp_path / 'ann'
    ann.mkdir()
    rows = ['%d,P01,v,x,00:00:00.00,00:00:01.00,0,30,v,%d,n,%d,[],[]'
            % (i, v, nn) for i, (v, nn) in
            enumerate([(0, 1), (1, 2), (2, 3), (0, 0)])]
    (ann / 'EPIC_train_action_labels.csv').write_text(
        'header\n' + '\n'.join(rows) + '\n')
    res = epic_actions.evaluate_actions(
        str(tmp_path / 'verb.pkl'), str(tmp_path / 'noun.pkl'), str(ann),
        num_seg=n)
    assert res['verb_top1'] == 75.0   # 3 of 4 correct
    assert res['noun_top1'] == 100.0
    assert res['action_top1'] == 75.0


# ----------------------------------------------------------------------- #
# multi-crop merging
# ----------------------------------------------------------------------- #

def test_merge_3shift_visibility(tmp_path):
    # wide video (h=100, w=200): at scale 256 crop 256 covers a fraction.
    # height=256, width=512 -> norm_crop = 256/512 = 0.5
    # left crop covers [0, .5], center [.25, .75], right [.5, 1].
    files = []
    for shift, score in [(0, 1.0), (1, 2.0), (2, 3.0)]:
        p = tmp_path / ('detections_final_256_shift%d_0.850.csv' % shift)
        # box [0.0, y, 0.3, y]: overlaps left crop [0,.5] and center
        # [.25,.75] (x2=0.3 > .25), not right [.5,1].
        p.write_text('vid,0902,0.0,0.1,0.3,0.5,5,%f\n' % score)
        files.append(str(p))
    out = multicrop.merge_3shift_files(files, flip=False, scale=256,
                                       video_shape_fn=lambda v: (100, 200))
    line = open(out).read().strip()
    score = float(line.split(',')[-1])
    expected = np.mean([multicrop.sigmoid(2.0), multicrop.sigmoid(1.0)])
    assert abs(score - expected) < 1e-6


def test_merge_score_files_sums(tmp_path):
    p1 = tmp_path / 'a.csv'
    p2 = tmp_path / 'b.csv'
    p1.write_text('vid,0902,0,0,1,1,5,0.25\n')
    p2.write_text('vid,0902,0,0,1,1,5,0.5\n')
    out = multicrop.merge_score_files([str(p1), str(p2)],
                                      str(tmp_path / 'final.csv'))
    assert abs(float(open(out).read().strip().split(',')[-1]) - 0.75) < 1e-9
