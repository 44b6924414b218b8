"""Generate the full per-dataset config tree, mirroring the reference's 20
shipped YAMLs (reference: dgmesh/configs/{d-nerf x8, dg-mesh x6, nerfies x2,
neural-actor x2, iphone x2}) with their per-dataset hyperparameter overrides
(SURVEY.md §2.4), plus the TPU capacity block tuned for the reference problem
size (800^2 images, 288^3 grid, ~100k Gaussians).

Run: python tools/gen_configs.py   (writes configs/<family>/<scene>.yaml)
"""

import os

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "configs")

# TPU-build capacities (no reference equivalent): padded-buffer sizes for jit
# + kernel/fast-path flags, tuned on v5e at the reference problem size.
TPU_BLOCK = """\
# TPU capacities
max_gaussians: 262144
max_verts: 524288
max_faces: 1048576
max_gaussians_per_tile: 768
max_dup: 4194304
max_faces_per_tile: 192
max_face_dup: 2097152
tile_chunk: 125
use_pallas: true
mt_narrow_band: true
dpsr_div_splat: true
dpsr_fft_matmul: true
"""

COMMON = dict(
    downsample=1.0, warm_up=3000, iterations=25000, eval=True,
    grid_res=288, init_density_threshold=0.0,
    mesh_img_loss_weight=1.0, laplacian_loss_weight=1.0,
    use_anchor=1.0, anchor_n_1_bs=128, anchor_0_1_bs=128, anchor_interval=100,
)

# family-level defaults; per-scene dicts override
FAMILIES = {
    "d-nerf": dict(
        base=dict(white_background=True, is_blender=True, densify_until_iter=8000,
                  dpsr_iter=10000, dpsr_sig=3.0, gaussian_ratio=1.2,
                  mask_loss_weight=1.0, anchor_iter=16000,
                  anchor_search_radius=0.0015),
        scenes=dict(
            bouncingballs=dict(densify_until_iter=5000),
            hellwarrior={}, hook={}, jumpingjacks={},
            lego=dict(densify_until_iter=5000, dpsr_sig=0.5),
            mutant={}, standup={},
            trex=dict(dpsr_sig=0.5),
        ),
        src="data/d-nerf/{s}", out="outputs/d-nerf/{s}",
    ),
    "dg-mesh": dict(
        base=dict(white_background=False, is_blender=True, densify_until_iter=8000,
                  dpsr_iter=10000, dpsr_sig=3.0, gaussian_ratio=1.2,
                  mask_loss_weight=1.0, anchor_iter=16000,
                  anchor_search_radius=0.0015),
        scenes=dict(
            beagle={}, bird={}, duck={}, girlwalk={},
            horse=dict(densify_until_iter=10000, dpsr_iter=12000,
                       mask_loss_weight=2.5),
            torus2sphere={},
        ),
        src="data/dg-mesh/{s}", out="outputs/dg-mesh/{s}",
    ),
    "nerfies": dict(
        base=dict(data_type="Nerfies", white_background=True, is_blender=False,
                  densify_until_iter=8000, apperance_lr_init=0.0008,
                  apperance_lr_final=0.000008, dpsr_iter=8000, dpsr_sig=3.0,
                  gaussian_ratio=1.0, gaussian_center=[-0.25, -0.25, -0.25],
                  mask_loss_weight=1.0, anchor_iter=16000,
                  anchor_search_radius=0.0015),
        scenes={"tail": {}, "toby-sit": {}},
        src="data/nerfies/{s}", out="outputs/nerfies/{s}",
    ),
    "iphone": dict(
        base=dict(data_type="iPhone", white_background=True, is_blender=False,
                  densify_until_iter=8000, dpsr_iter=8000, dpsr_sig=3.0,
                  gaussian_ratio=1.0, gaussian_center=[-0.25, -0.25, -0.25],
                  mask_loss_weight=1.0, anchor_iter=10000,
                  anchor_search_radius=0.0005),
        scenes=dict(
            starbucks=dict(apperance_lr_init=0.00016, apperance_lr_final=0.0000016),
            tiger=dict(apperance_lr_init=0.0008, apperance_lr_final=0.000008),
        ),
        src="data/iphone-captured/{s}", out="outputs/iphone-captured/{s}",
    ),
    "neural-actor": dict(
        base=dict(data_type="NeuralActor", white_background=True, is_blender=True,
                  densify_until_iter=4000, dpsr_sig=3.0,
                  mask_loss_weight=1.0, anchor_iter=16000,
                  anchor_search_radius=0.0015),
        scenes=dict(
            D2_vlad=dict(normal_warm_up=2000, dpsr_iter=10000, gaussian_ratio=2.5,
                         gaussian_center=[0.1, 0.8, 0.75],
                         src="data/neural-actor/D2_vlad/processed_dynamic_crop5"),
            N1_lingjie_yellowpants=dict(
                dpsr_iter=8000, gaussian_ratio=1.3,
                src="data/neural-actor/N1_lingjie_yellowpants/processed_dynamic_crop"),
        ),
        src="data/neural-actor/{s}", out="outputs/neural-actor/{s}",
    ),
}


def _fmt(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, list):
        return "[" + ", ".join(str(x) for x in v) + "]"
    return str(v)


def main():
    count = 0
    for fam, spec in FAMILIES.items():
        os.makedirs(os.path.join(ROOT, fam), exist_ok=True)
        for scene, over in spec["scenes"].items():
            over = dict(over)
            src = over.pop("src", spec["src"].format(s=scene))
            d = dict(COMMON)
            d.update(spec["base"])
            d.update(over)
            d["source_path"] = src
            d["model_path"] = spec["out"].format(s=scene)
            lines = [
                f"# {fam}/{scene} — mirrors reference configs/{fam}/{scene}.yaml",
                "# (generated by tools/gen_configs.py; edit that, not this)",
            ]
            order = ["source_path", "model_path", "data_type", "downsample",
                     "densify_until_iter", "warm_up", "normal_warm_up",
                     "iterations", "white_background", "eval", "is_blender",
                     "apperance_lr_init", "apperance_lr_final",
                     "dpsr_iter", "dpsr_sig", "grid_res", "gaussian_ratio",
                     "gaussian_center", "init_density_threshold",
                     "mask_loss_weight", "mesh_img_loss_weight",
                     "laplacian_loss_weight", "use_anchor", "anchor_iter",
                     "anchor_n_1_bs", "anchor_0_1_bs", "anchor_search_radius",
                     "anchor_interval"]
            for k in order:
                if k in d:
                    lines.append(f"{k}: {_fmt(d[k])}")
            lines.append(TPU_BLOCK.rstrip())
            path = os.path.join(ROOT, fam, scene + ".yaml")
            with open(path, "w") as f:
                f.write("\n".join(lines) + "\n")
            count += 1
    print(f"wrote {count} configs under {ROOT}")


if __name__ == "__main__":
    main()
