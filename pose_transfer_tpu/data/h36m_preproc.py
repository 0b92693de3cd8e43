"""Human3.6M offline preprocessing: background-masked, square-cropped frames.

Rebuild of src_deformable/utils/proc_bg_h36m.py — the offline tool that turns
raw H36M videos into the 224×224 foreground JPEGs the dataset consumes:

- walks subject/action/subaction/camera combinations, resolving each video
  filename through the H36M ``metadata.xml`` mapping (proc_bg_h36m.py:40-43);
- uses the ground-truth background videos to mask the foreground
  (``bg > 100 → 1`` multiply, proc_bg_h36m.py:80-82);
- square-pads the per-frame bbox from ``matlab_meta.mat`` and crops+resizes
  to 224×224 (proc_bg_h36m.py:85-105);
- keeps every 5th frame (proc_bg_h36m.py:77-78), naming frames
  ``s_SS_act_AA_subact_SS_ca_CC_FFFFFF.jpg``.

The reference hardcoded absolute paths and a subject filter; here everything
is parameterized. Requires the raw H36M release on disk (not shipped).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ElementTree

import numpy as np

SUBJECT_LIST = (1, 5, 6, 7, 8, 9, 11)
ACTION_LIST = tuple(range(2, 17))
SUBACTION_LIST = (1, 2)
CAMERA_LIST = (1, 2, 3, 4)


def square_pad_bbox(bb: np.ndarray, img_w: int, img_h: int) -> np.ndarray:
    """The reference's square-padding of [x0, y0, x1, y1]
    (proc_bg_h36m.py:85-105): clamp, pad the short side symmetrically,
    clamp again."""
    bb = bb.astype(np.float64).copy()
    bb[bb < 0] = 0
    bb[2] = min(bb[2], img_w)
    bb[3] = min(bb[3], img_h)
    bb = np.round(bb)
    if bb[3] - bb[1] > bb[2] - bb[0]:
        pad = ((bb[3] - bb[1]) - (bb[2] - bb[0])) / 2
        bb[2] += pad
        bb[0] -= pad
    else:
        pad = ((bb[2] - bb[0]) - (bb[3] - bb[1])) / 2
        bb[3] += pad
        bb[1] -= pad
    bb[bb < 0] = 0
    bb[2] = min(bb[2], img_w)
    bb[3] = min(bb[3], img_h)
    return np.round(bb).astype(np.int32)


def mask_foreground(image: np.ndarray, bg_image: np.ndarray) -> np.ndarray:
    """bg pixels > 100 become the pass-through mask (proc_bg_h36m.py:80-82)."""
    bg = bg_image.copy()
    bg[bg > 100] = 1
    return np.multiply(image, bg)


def process_frame(image: np.ndarray, bg_image: np.ndarray, bb: np.ndarray,
                  out_size: int = 224) -> np.ndarray:
    """Mask + square-crop + resize one frame."""
    import cv2

    fg = mask_foreground(image, bg_image)
    bb = square_pad_bbox(np.asarray(bb), image.shape[1], image.shape[0])
    crop = fg[bb[1]:bb[3], bb[0]:bb[2], :]
    return cv2.resize(crop, (out_size, out_size))


def video_name_for(xml_mapping, xml_cameras, subject: int, action: int,
                   subaction: int, camera: int) -> str:
    """Resolve the .mp4 name from metadata.xml (proc_bg_h36m.py:40-43)."""
    base = xml_mapping[int(action * 2 + subaction - 2)][int(subject + 1)].text
    cam = xml_cameras[0][int(camera - 1)].text
    return f"{base}.{cam}.mp4"


def process_h36m(root_dir: str, xml_path: str, annot_path: str,
                 save_path: str, *, subjects=SUBJECT_LIST,
                 actions=ACTION_LIST, subactions=SUBACTION_LIST,
                 cameras=CAMERA_LIST, frame_stride: int = 5,
                 out_size: int = 224, annot_name: str = "matlab_meta.mat",
                 limit_frames: int | None = None) -> int:
    """Full sweep; returns number of frames written."""
    import cv2
    import scipy.io as sio

    xml_file = ElementTree.parse(xml_path)
    xml_mapping = xml_file.find("mapping")
    xml_cameras = xml_file.find("dbcameras")
    written = 0

    for subject in subjects:
        for action in actions:
            for subaction in subactions:
                for camera in cameras:
                    name = "s_{:02d}_act_{:02d}_subact_{:02d}_ca_{:02d}" \
                        .format(subject, action, subaction, camera)
                    os.makedirs(os.path.join(save_path, name), exist_ok=True)
                    vid_name = video_name_for(xml_mapping, xml_cameras,
                                              subject, action, subaction,
                                              camera)
                    vid = os.path.join(root_dir, f"S{subject}", "Videos",
                                       vid_name)
                    bg_vid = os.path.join(root_dir, f"S{subject}",
                                          "ground_truth_bs", vid_name)
                    annot = os.path.join(annot_path, name, annot_name)
                    if not (os.path.exists(vid) and os.path.exists(bg_vid)
                            and os.path.exists(annot)):
                        continue
                    bboxx = sio.loadmat(annot)["bbox"].transpose(1, 0)
                    cap = cv2.VideoCapture(vid)
                    bg_cap = cv2.VideoCapture(bg_vid)
                    index = 0
                    while True:
                        ok, image = cap.read()
                        ok_bg, bg_image = bg_cap.read()
                        index += 1
                        if not (ok and ok_bg):
                            break
                        if (index - 1) % frame_stride != 0:
                            continue
                        frame = process_frame(image, bg_image,
                                              bboxx[index - 1], out_size)
                        out = os.path.join(
                            save_path, name,
                            f"{name}_{index:06d}.jpg")
                        cv2.imwrite(out, frame)
                        written += 1
                        if limit_frames and written >= limit_frames:
                            return written
    return written
