"""ROS node wiring (toolkit/ros_nodes.py) driven through FAKE transport
modules — the TPU-native analog of a fake backend (SURVEY.md §4): the
reference's nodes were only testable on a robot; here the topic wiring,
depth-encoding handling, frame snapshots, and the speech-selected publish
loop run against in-memory rospy/cv_bridge/message_filters stand-ins, so
the logic is covered without ROS."""

import os
import sys
import time
import types

import numpy as np
import pytest

# reuse the trained tiny-checkpoint environment from the toolkit tests
from tests.test_toolkit import classifier_env  # noqa: F401 (pytest fixture)


class _Msg:
    """Stand-in for a ROS Image message: carries a numpy array."""

    def __init__(self, arr, encoding="rgb8"):
        self.arr = np.asarray(arr)
        self.encoding = encoding


class _FakeBridge:
    def imgmsg_to_cv2(self, msg, fmt=None):
        return msg.arr

    def cv2_to_imgmsg(self, arr, fmt=None):
        return _Msg(arr, fmt or "rgb8")


class _FakePublisher:
    def __init__(self, topic, msg_type, queue_size=10):
        self.topic = topic
        self.published = []

    def publish(self, value):
        self.published.append(value)


@pytest.fixture()
def fake_ros(monkeypatch):
    """Install fake rospy / message_filters / sensor_msgs / std_msgs /
    cv_bridge modules and return handles to their captured state."""
    state = {
        "publishers": {},
        "callbacks": [],
        "logerr": [],
        "shutdown_after": None,  # is_shutdown(): False n times, then True
        "_spin_count": 0,
    }

    rospy = types.ModuleType("rospy")
    rospy.Publisher = lambda topic, msg_type, queue_size=10: state["publishers"].setdefault(
        topic, _FakePublisher(topic, msg_type, queue_size)
    )

    class _CameraInfoMsg:
        K = tuple(np.asarray([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]]).ravel())

    rospy.wait_for_message = lambda topic, msg_type: _CameraInfoMsg()
    rospy.logerr_throttle = lambda period, msg: state["logerr"].append(msg)

    def is_shutdown():
        state["_spin_count"] += 1
        n = state["shutdown_after"]
        return n is not None and state["_spin_count"] > n

    rospy.is_shutdown = is_shutdown

    message_filters = types.ModuleType("message_filters")

    class _Subscriber:
        def __init__(self, topic, msg_type, queue_size=10):
            self.topic = topic

    class _Synchronizer:
        def __init__(self, subs, queue_size=10, slop=0.5):
            self.subs = subs

        def registerCallback(self, cb):  # noqa: N802 (ROS API)
            state["callbacks"].append(cb)

    message_filters.Subscriber = _Subscriber
    message_filters.ApproximateTimeSynchronizer = _Synchronizer

    sensor_msgs = types.ModuleType("sensor_msgs")
    sensor_msgs_msg = types.ModuleType("sensor_msgs.msg")
    sensor_msgs_msg.CameraInfo = _CameraInfoMsg
    sensor_msgs_msg.Image = _Msg
    sensor_msgs.msg = sensor_msgs_msg

    std_msgs = types.ModuleType("std_msgs")
    std_msgs_msg = types.ModuleType("std_msgs.msg")
    std_msgs_msg.Int32 = int
    std_msgs_msg.Float32 = float
    std_msgs.msg = std_msgs_msg

    cv_bridge = types.ModuleType("cv_bridge")
    cv_bridge.CvBridge = _FakeBridge

    for name, mod in {
        "rospy": rospy,
        "message_filters": message_filters,
        "sensor_msgs": sensor_msgs,
        "sensor_msgs.msg": sensor_msgs_msg,
        "std_msgs": std_msgs,
        "std_msgs.msg": std_msgs_msg,
        "cv_bridge": cv_bridge,
    }.items():
        monkeypatch.setitem(sys.modules, name, mod)
    return state


def _frame(h=24, w=32):
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    depth_m = np.full((h, w), 1.5, np.float32)
    label = np.zeros((h, w), np.int32)
    label[4:12, 4:12] = 1
    label[14:22, 16:28] = 2
    score = np.full((h, w), 0.9, np.float32)
    return rgb, depth_m, label, score


def test_seg_listener_sync_snapshot_and_boxes(fake_ros):
    from protoclip_tpu.toolkit.ros_nodes import SegImageListener

    listener = SegImageListener("Fetch")
    assert listener.intrinsics.shape == (3, 3)
    assert len(fake_ros["callbacks"]) == 1
    assert listener.snapshot()[0] is None and listener.object_boxes() == []

    rgb, depth_m, label, score = _frame()
    # Fetch publishes 16UC1 millimeters: the callback must convert to meters
    depth_mm = (depth_m * 1000).astype(np.uint16)
    fake_ros["callbacks"][0](
        _Msg(rgb), _Msg(depth_mm, "16UC1"), _Msg(label), _Msg(score)
    )
    got_rgb, got_depth, got_label, got_score = listener.snapshot()
    np.testing.assert_array_equal(got_rgb, rgb)
    np.testing.assert_allclose(got_depth, depth_m)  # mm -> m
    boxes = listener.object_boxes()
    assert sorted(mask_id for mask_id, _ in boxes) == [1, 2]

    # reference-exact per-frame boxes (seg_image_listener.py:229-285).
    # A CONSTANT-depth frame yields zero z extent and every box is filtered
    # (exactly the reference's `bbox[:, 5] > 0`):
    assert listener.bbox_frame().shape == (0, 8)
    # with real depth variation both masks produce boxes
    rng = np.random.default_rng(3)
    depth_var = depth_m + rng.uniform(0, 0.2, depth_m.shape).astype(np.float32)
    fake_ros["callbacks"][0](
        _Msg(rgb), _Msg(depth_var, "32FC1"), _Msg(label), _Msg(score)
    )
    frame_boxes = listener.bbox_frame()
    assert frame_boxes.shape == (2, 8) and frame_boxes.dtype == np.float32
    assert sorted(frame_boxes[:, 7]) == [1.0, 2.0]
    np.testing.assert_allclose(frame_boxes[:, 6], 0.9, atol=1e-6)  # score
    # against the robot.py math directly on the same frame
    from protoclip_tpu.toolkit.robot import backproject, segmentation_boxes_3d

    want = segmentation_boxes_3d(
        backproject(depth_var, listener.intrinsics), label, score, depth_var, np.eye(4)
    )
    np.testing.assert_allclose(frame_boxes, want, atol=1e-6)
    # restore the constant-depth frame for the encoding checks below
    fake_ros["callbacks"][0](
        _Msg(rgb), _Msg(depth_m, "32FC1"), _Msg(label), _Msg(score)
    )

    # unsupported encoding: log-and-skip, frame unchanged (ref
    # seg_image_listener.py:216 behavior)
    fake_ros["callbacks"][0](
        _Msg(rgb), _Msg(depth_m, "8UC1"), _Msg(label), _Msg(score)
    )
    assert fake_ros["logerr"] and "8UC1" in fake_ros["logerr"][0]
    np.testing.assert_allclose(listener.snapshot()[1], depth_m)


def test_seg_listener_save_data(fake_ros, tmp_path):
    from protoclip_tpu.io.mat import load_mat
    from protoclip_tpu.toolkit.ros_nodes import SegImageListener

    listener = SegImageListener("Realsense")
    with pytest.raises(RuntimeError, match="no synchronized frame"):
        listener.save_data(str(tmp_path), 0)
    rgb, depth_m, label, score = _frame()
    fake_ros["callbacks"][0](
        _Msg(rgb), _Msg(depth_m, "32FC1"), _Msg(label), _Msg(score)
    )
    out = listener.save_data(str(tmp_path), 3)
    meta = load_mat(out)
    assert meta["intrinsic_matrix"].shape == (3, 3)


def test_grasp_node_publishes_selected_mask(fake_ros, monkeypatch, classifier_env):
    """run_once: crops -> classify -> (faked) speech noun -> republish the
    matching mask id + its probability N times (ref proto_clip_node.py:93-110)."""
    import protoclip_tpu.toolkit.speech as speech
    from protoclip_tpu.toolkit import ProtoClipClassifier
    from protoclip_tpu.toolkit.ros_nodes import ProtoClipGraspNode

    clf = ProtoClipClassifier(
        classifier_env["cfg"],
        splits_path=classifier_env["splits"],
        memory_bank_v_path=classifier_env["v"],
        memory_bank_t_path=classifier_env["t"],
        adapter_weights_path=classifier_env["a"],
    )
    node = ProtoClipGraspNode(
        clf, tagger=None, republish_count=2,
        log_dir=os.path.join(classifier_env["tmp"], "ros-demo-logs"),
    )
    assert node.run_once() is None  # no frame yet

    rgb, depth_m, label, score = _frame(40, 48)
    fake_ros["callbacks"][0](
        _Msg(rgb), _Msg(depth_m, "32FC1"), _Msg(label), _Msg(score)
    )

    # fake the ASR: "pick up the <first crop's top-1 class>"
    crops_names, _ = clf.classify_objects(
        [rgb[4:12, 4:12]], log=False
    )
    target_noun = crops_names[0][0]
    monkeypatch.setattr(
        speech, "transcribe_with_verb_and_noun_matching",
        lambda tagger, **kw: ("pick", target_noun),
    )
    monkeypatch.setattr(time, "sleep", lambda s: None)

    noun = node.run_once()
    assert noun == target_noun
    label_pub = fake_ros["publishers"]["/selected_seg_label"]
    score_pub = fake_ros["publishers"]["/selected_seg_score"]
    assert len(label_pub.published) == 2 and len(score_pub.published) == 2
    assert all(m in (1, 2) for m in label_pub.published)
    assert all(0.0 <= s <= 1.0 for s in score_pub.published)

    # noun nobody predicted: nothing new published, returns None
    monkeypatch.setattr(
        speech, "transcribe_with_verb_and_noun_matching",
        lambda tagger, **kw: ("pick", "nonexistent thing"),
    )
    assert node.run_once() is None
    assert len(label_pub.published) == 2


def test_results_node_publishes_canvas(fake_ros, monkeypatch, classifier_env):
    from protoclip_tpu.toolkit import ProtoClipClassifier
    from protoclip_tpu.toolkit.ros_nodes import ProtoClipResultsNode

    clf = ProtoClipClassifier(
        classifier_env["cfg"],
        splits_path=classifier_env["splits"],
        memory_bank_v_path=classifier_env["v"],
        memory_bank_t_path=classifier_env["t"],
        adapter_weights_path=classifier_env["a"],
    )
    node = ProtoClipResultsNode(clf, period_s=0.0)
    rgb, depth_m, label, score = _frame(40, 48)
    fake_ros["callbacks"][0](
        _Msg(rgb), _Msg(depth_m, "32FC1"), _Msg(label), _Msg(score)
    )
    fake_ros["shutdown_after"] = 1  # one spin iteration, then shutdown
    monkeypatch.setattr(time, "sleep", lambda s: None)
    node.spin()
    pub = fake_ros["publishers"]["/proto_clip_pred"]
    assert len(pub.published) == 1
    canvas_msg = pub.published[0]
    assert canvas_msg.arr.ndim == 3 and canvas_msg.encoding == "rgb8"
