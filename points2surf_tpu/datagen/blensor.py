"""BlenSor/Blender external-scanner passthrough.

The native on-device scanner (datagen/scanner.py) is the default; this
module preserves the reference's external-tool interface
(make_dataset.py:242-380): per-mesh python scripts rendered from a template
and executed in headless Blender via a process pool. Use when bit-equal
BlenSor sensor simulation is required and a BlenSor binary is available.
"""

from __future__ import annotations

import os


from points2surf_tpu.datagen.scanner import scan_poses

from points2surf_tpu.utils.mp import mp_worker, start_process_pool

# Minimal BlenSor ToF driver script; same placeholders as the reference
# template (blensor_script_template.py) and the same sensor parameters.
SCRIPT_TEMPLATE = '''\
import bpy
from mathutils import Vector, Quaternion
import blensor

evd_files = {evd_files}
obj_locations = {obj_locations}
obj_rotations = {obj_rotations}
scan_sigmas = {scan_sigmas}

bpy.ops.object.select_all(action="DESELECT")
bpy.data.objects["Cube"].select = True
bpy.ops.object.delete()

bpy.ops.import_mesh.ply(filepath='{file_loc}')
obj = bpy.context.selected_objects[0]
obj.rotation_mode = 'QUATERNION'

scanner = bpy.data.objects["Camera"]
scanner.rotation_mode = 'QUATERNION'
scanner.local_coordinates = False
scanner.location = Vector([0.0, 0.0, 0.0])

for i in range(len(evd_files)):
    obj.location = Vector(obj_locations[i])
    obj.rotation_quaternion = Quaternion(obj_rotations[i])
    blensor.tof.scan_advanced(
        scanner, evd_file=evd_files[i], evd_last_scan=True,
        max_distance=10.0, add_blender_mesh=False,
        add_noisy_blender_mesh=False, tof_res_x=176, tof_res_y=144,
        lens_angle_w=43.6, lens_angle_h=34.6, flength=10.0,
        noise_mu=0.0, noise_sigma=scan_sigmas[i], backfolding=False,
    )

bpy.ops.wm.quit_blender()
'''


def write_blensor_scripts(
    base_dir, dataset_dir, dir_in, dir_out_pcd, dir_out_scripts,
    num_scans_per_mesh_min, num_scans_per_mesh_max,
    scanner_noise_sigma_min, scanner_noise_sigma_max,
):
    """Render per-mesh scanning scripts; poses identical to the native
    scanner (same filename-hash RNG). Returns the list of script paths."""
    dir_in_abs = os.path.join(base_dir, dataset_dir, dir_in)
    dir_pcd_abs = os.path.join(base_dir, dataset_dir, dir_out_pcd)
    dir_scripts_abs = os.path.join(base_dir, dataset_dir, dir_out_scripts)
    os.makedirs(dir_pcd_abs, exist_ok=True)
    os.makedirs(dir_scripts_abs, exist_ok=True)

    scripts = []
    for f in sorted(os.listdir(dir_in_abs)):
        if not f.endswith(".ply"):
            continue
        mesh_file = os.path.join(dir_in_abs, f)
        locations, rotations, sigma = scan_poses(
            mesh_file, num_scans_per_mesh_min, num_scans_per_mesh_max,
            scanner_noise_sigma_min, scanner_noise_sigma_max,
        )
        evd_files = [
            os.path.join(
                dir_pcd_abs, f[:-4] + f"_{str(i).zfill(5)}.numpy.gz"
            )
            for i in range(len(locations))
        ]
        script = SCRIPT_TEMPLATE.format(
            file_loc=mesh_file.replace("\\", "/"),
            evd_files=str(evd_files).replace("\\", "/"),
            obj_locations=str([l.tolist() for l in locations]),
            obj_rotations=str([r.tolist() for r in rotations]),
            scan_sigmas=str([float(sigma)] * len(locations)),
        )
        script_file = os.path.join(dir_scripts_abs, f[:-4] + ".py")
        with open(script_file, "w") as fh:
            fh.write(script)
        scripts.append(script_file)
    return scripts


def run_blensor(blensor_bin, script_files, num_processes=4):
    """Execute the rendered scripts in headless Blender
    (reference make_dataset.py:353-357)."""
    calls = [(f"{blensor_bin} -P {s} -b",) for s in script_files]
    return start_process_pool(mp_worker, calls, num_processes)
