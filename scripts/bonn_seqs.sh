# Bonn dynamic-sequence list shared by eval_bonn_metrics.sh and
# transform_bonn_estimates.sh (they must stay in lockstep: transform writes
# the directories metrics reads).
SEQS=(rgbd_bonn_removing_nonobstructing_box2 rgbd_bonn_removing_obstructing_box
      rgbd_bonn_moving_nonobstructing_box2 rgbd_bonn_crowd rgbd_bonn_kidnapping_box
      rgbd_bonn_balloon rgbd_bonn_placing_nonobstructing_box rgbd_bonn_synchronous
      rgbd_bonn_static_close_far rgbd_bonn_synchronous2 rgbd_bonn_moving_nonobstructing_box
      rgbd_bonn_balloon_tracking rgbd_bonn_removing_nonobstructing_box
      rgbd_bonn_moving_obstructing_box rgbd_bonn_person_tracking
      rgbd_bonn_placing_nonobstructing_box2 rgbd_bonn_crowd2 rgbd_bonn_person_tracking2
      rgbd_bonn_crowd3 rgbd_bonn_placing_nonobstructing_box3 rgbd_bonn_balloon2
      rgbd_bonn_moving_obstructing_box2 rgbd_bonn_balloon_tracking2
      rgbd_bonn_placing_obstructing_box rgbd_bonn_kidnapping_box2)
