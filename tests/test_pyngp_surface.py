"""pyngp API-surface parity: the names the reference module exposes
(ref: src/python_api.cu:306-888) must exist on the shim."""
import numpy as np
import pytest


def test_module_level_names():
    import ngp_tpu.api.pyngp_shim as ngp
    for name in ["TestbedMode", "RenderMode", "RandomMode", "LossType",
                 "ColorSpace", "TonemapCurve", "LensMode", "CameraModel",
                 "MaskMode", "MaskShape", "GroundTruthRenderMode",
                 "SDFGroundTruthMode", "NerfActivation", "MeshSdfMode",
                 "BoundingBox", "Mask3D", "RenderRequest",
                 "RenderOutputProperties", "RenderCameraProperties",
                 "NerfDescriptor", "DownsampleInfo", "Testbed",
                 "free_temporary_memory"]:
        assert hasattr(ngp, name), name


def test_testbed_methods_and_properties():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import ngp_tpu.api.pyngp_shim as ngp
    tb = ngp.Testbed(ngp.TestbedMode.Nerf)
    methods = [
        "load_training_data", "reload_network_from_file",
        "reload_network_from_json", "frame", "train", "render",
        "request_nerf_render_sync", "request_nerf_render_async",
        "render_with_rolling_shutter", "save_snapshot", "load_snapshot",
        "load_camera_path", "screenshot", "compute_image_mse",
        "calculate_iou", "n_params", "reset_accumulation", "want_repl",
        "set_nerf_camera_matrix", "set_camera_to_training_view",
        "first_training_view", "set_camera_intrinsics",
        "set_camera_extrinsics", "get_camera_extrinsics", "set_image",
        "create_empty_nerf_dataset", "compute_marching_cubes_mesh",
        "compute_and_save_marching_cubes_mesh",
        "compute_and_save_png_slices", "override_sdf_training_data",
    ]
    for m in methods:
        assert callable(getattr(tb, m, None)), m
    props = ["shall_train", "background_color", "exposure", "fov_axis",
             "zoom", "screen_center", "render_mode", "dynamic_res",
             "dynamic_res_target_fps", "fixed_res_factor",
             "render_groundtruth", "groundtruth_render_mode",
             "snap_to_pixel_centers", "render_near_distance",
             "camera_matrix", "training_batch_size", "camera_smoothing",
             "autofocus", "sun_dir", "up_dir", "training_step", "loss"]
    for p in props:
        assert hasattr(tb, p), p
    # per-mode namespaces with training knobs
    t = tb.nerf.training
    for k in ["random_bg_color", "linear_colors", "snap_to_pixel_centers",
              "optimize_extrinsics", "optimize_exposure",
              "optimize_extra_dims", "optimize_distortion",
              "optimize_focal_length", "n_steps_between_cam_updates",
              "near_distance", "density_grid_decay",
              "depth_supervision_lambda",
              "sample_image_proportional_to_error",
              "sample_focal_plane_proportional_to_error",
              "n_images_for_training", "dataset"]:
        assert hasattr(t, k), k
    for k in ["mesh_sdf_mode", "mesh_scale", "analytic_normals",
              "shadow_sharpness", "fd_normals_epsilon", "zero_offset",
              "distance_scale", "calculate_iou_online", "groundtruth_mode",
              "brdf"]:
        assert hasattr(tb.sdf, k), k
    for k in ["metallic", "subsurface", "specular", "roughness", "sheen",
              "clearcoat", "clearcoat_gloss", "basecolor", "ambientcolor"]:
        assert hasattr(tb.sdf.brdf, k), k


def test_bounding_box_surface():
    import ngp_tpu.api.pyngp_shim as ngp
    bb = ngp.BoundingBox((0, 0, 0), (2, 2, 2))
    for m in ["center", "contains", "diag", "distance", "distance_sq",
              "enlarge", "get_vertices", "inflate", "intersection",
              "intersects", "ray_intersect", "relative_pos"]:
        assert callable(getattr(bb, m, None)), m
    assert bb.get_vertices().shape == (8, 3)
