"""Generic CLI tools (reference nunif/cli/: i2i, merge_model,
count_parameters, diff_image, show_train_args, list_device, segment_video)."""
