"""Mask-provider tests: the heavyweight backends (carvekit/detectron2) are
not installed here, so the reference-semantics selection logic and the
adapter I/O conventions are pinned with mocked predictors instead
(reference semantics: src/preprocess_mask_rcnn.py:42-58,
src/preprocess_mask_portrait.py:38-44)."""

import numpy as np
import pytest


class FakeTensor:
    def __init__(self, arr):
        self.arr = np.asarray(arr)

    def cpu(self):
        return self

    def numpy(self):
        return self.arr


class FakeInstances:
    def __init__(self, masks, classes):
        self.pred_masks = FakeTensor(masks)
        self.pred_classes = FakeTensor(classes)


COCO = ["person", "bicycle", "car", "dog"]


def make_rcnn(class_name, masks, classes, record=None):
    """MaskRCNNMasks with a mocked detectron2 predictor (the real ctor
    downloads model-zoo weights)."""
    from deflicker_tpu.seg.providers import MaskRCNNMasks

    prov = MaskRCNNMasks.__new__(MaskRCNNMasks)

    def predictor(bgr):
        if record is not None:
            record.append(bgr)
        return {"instances": FakeInstances(masks, classes)}

    prov.predictor = predictor
    prov.classes = COCO
    prov.class_name = class_name
    return prov


class TestMaskRCNNSelection:
    def _masks(self):
        m = np.zeros((3, 4, 5), bool)
        m[0, 0, 0] = True        # instance 0: class car
        m[1, 1, 1] = True        # instance 1: class dog
        m[2, 2, 2] = True        # instance 2: class dog
        return m, np.array([2, 3, 3])

    def test_anything_takes_first_instance(self):
        masks, classes = self._masks()
        out = make_rcnn("anything", masks, classes).compute_mask(
            np.zeros((4, 5, 3), np.uint8))
        np.testing.assert_array_equal(out, masks[0].astype(np.float32))

    def test_class_match_takes_first_of_class(self):
        masks, classes = self._masks()
        out = make_rcnn("dog", masks, classes).compute_mask(
            np.zeros((4, 5, 3), np.uint8))
        np.testing.assert_array_equal(out, masks[1].astype(np.float32))

    def test_no_match_gives_black_mask(self):
        masks, classes = self._masks()
        out = make_rcnn("person", masks, classes).compute_mask(
            np.zeros((4, 5, 3), np.uint8))
        assert out.shape == (4, 5)
        assert (out == 0).all()

    def test_no_detections_gives_black_mask(self):
        out = make_rcnn("anything", np.zeros((0, 4, 5), bool),
                        np.zeros((0,), int)).compute_mask(
            np.zeros((4, 5, 3), np.uint8))
        assert (out == 0).all()

    def test_predictor_receives_bgr(self):
        # detectron2's DefaultPredictor wants BGR input
        # (preprocess_mask_rcnn.py reads with cv2 => BGR)
        masks, classes = self._masks()
        seen = []
        rgb = np.zeros((4, 5, 3), np.uint8)
        rgb[..., 0] = 255        # pure red in RGB
        make_rcnn("anything", masks, classes, record=seen).compute_mask(rgb)
        assert seen[0][..., 2].min() == 255 and seen[0][..., 0].max() == 0


class TestCarvekitAdapter:
    def test_alpha_thresholding(self):
        from PIL import Image

        from deflicker_tpu.seg.providers import CarvekitMasks

        prov = CarvekitMasks.__new__(CarvekitMasks)
        alpha = np.zeros((4, 5), np.uint8)
        alpha[1:3, 1:4] = 200          # > 0.5 after /255
        alpha[0, 0] = 100              # < 0.5 -> background
        rgba = np.dstack([np.zeros((4, 5, 3), np.uint8), alpha])
        prov.interface = lambda imgs: [Image.fromarray(rgba, "RGBA")]

        out = prov.compute_mask(np.zeros((4, 5, 3), np.uint8))
        expected = (alpha.astype(np.float32) / 255.0 > 0.5).astype(np.float32)
        np.testing.assert_array_equal(out, expected)


class TestProviderSelection:
    def test_portrait_routes_to_carvekit(self):
        from deflicker_tpu.seg.providers import get_mask_provider

        # carvekit is absent here -> the adapter must raise the clear
        # ImportError rather than something opaque
        with pytest.raises(ImportError, match="carvekit"):
            get_mask_provider("portrait")

    def test_other_class_routes_to_maskrcnn(self):
        from deflicker_tpu.seg.providers import get_mask_provider

        with pytest.raises(ImportError, match="detectron2"):
            get_mask_provider("dog")

    def test_grabcut_override(self):
        from deflicker_tpu.seg.providers import (GrabCutMasks,
                                                 get_mask_provider)

        assert isinstance(get_mask_provider("portrait", "grabcut"),
                          GrabCutMasks)


class TestPreprocessMasks:
    def test_writes_seg_contract_and_is_idempotent(self, tmp_path):
        from PIL import Image

        from deflicker_tpu.seg.providers import preprocess_masks

        frames = tmp_path / "vid"
        frames.mkdir()
        for t in range(3):
            Image.fromarray(
                np.full((6, 7, 3), t * 40, np.uint8)).save(
                frames / f"{t:05d}.png")

        calls = []

        class Counting:
            def compute_mask(self, rgb):
                calls.append(1)
                return np.ones(rgb.shape[:2], np.float32)

        out = preprocess_masks(frames, Counting(), verbose=False)
        assert len(out) == 3 and len(calls) == 3
        seg = tmp_path / "vid_seg"
        m = np.array(Image.open(seg / "00000.png"))
        assert m.dtype == np.uint8 and set(np.unique(m)) <= {0, 255}

        preprocess_masks(frames, Counting(), verbose=False)
        assert len(calls) == 3          # second run: all cached
