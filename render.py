"""CLI: render a saved pose file to a stick-figure animation.

Completes the decoupled generate -> render workflow (SURVEY.md §2 C7/C11:
export pose sequence, render stick-figure video): generate.py saves
poses (.npy or self-describing .json), this renders them later with no
checkpoint or TPU needed.

  python generate.py --ckpt runs/full --wav song.wav --out poses.json
  python render.py --poses poses.json --out dance.gif
"""

from __future__ import annotations

from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("poses", None,
                    "pose file from generate.py (.npy/.json/.bvh)")
flags.DEFINE_string("out", "dance.gif", "output animation (.mp4/.gif)")
flags.DEFINE_float("fps", 0.0,
                   "frame rate; 0 = from the .json metadata, else 30")
flags.DEFINE_string("trajectories", None,
                    "also plot per-joint trajectories to this image file")
flags.mark_flag_as_required("poses")


def main(argv):
    del argv
    import json

    from music2dance_tpu.infer.poses_io import load_poses
    from music2dance_tpu.utils.visualize import (plot_pose_trajectories,
                                                 render_pose_video)

    fps = FLAGS.fps
    if FLAGS.poses.endswith(".bvh"):
        # one parse serves both the poses and the frame rate
        from music2dance_tpu.data.bvh import bvh_joint_positions, parse_bvh

        bvh = parse_bvh(FLAGS.poses)
        _, poses = bvh_joint_positions(bvh)
        if fps <= 0:
            fps = bvh.fps
    else:
        poses = load_poses(FLAGS.poses)
        if fps <= 0:
            fps = 30.0
            if FLAGS.poses.endswith(".json"):
                with open(FLAGS.poses) as f:
                    fps = float(json.load(f).get("fps", 30.0))
    render_pose_video(poses, FLAGS.out, fps=fps)
    print(f"{FLAGS.poses} ({poses.shape[0]} frames) -> {FLAGS.out} @ {fps:g} fps")
    if FLAGS.trajectories:
        plot_pose_trajectories(poses, FLAGS.trajectories)
        print(f"trajectories -> {FLAGS.trajectories}")


if __name__ == "__main__":
    app.run(main)
