from badslam_tpu.viz.viewer import export_html_viewer  # noqa: F401
