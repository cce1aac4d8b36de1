# TUM dynamic-sequence list shared by eval_tum2.sh and eval_tum2_metrics.sh.
SEQS=(rgbd_dataset_freiburg2_desk_with_person
      rgbd_dataset_freiburg3_sitting_static
      rgbd_dataset_freiburg3_sitting_xyz
      rgbd_dataset_freiburg3_sitting_halfsphere
      rgbd_dataset_freiburg3_sitting_rpy
      rgbd_dataset_freiburg3_walking_static
      rgbd_dataset_freiburg3_walking_xyz
      rgbd_dataset_freiburg3_walking_halfsphere
      rgbd_dataset_freiburg3_walking_rpy)
