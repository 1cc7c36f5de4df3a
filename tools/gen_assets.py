#!/usr/bin/env python3
"""Generate the framework's spec assets (the reference ships equivalents as
data files: src/data/characters/humanoid3d.txt, data/controllers/
humanoid3d_ctrl.txt, data/agents/ct_agent_humanoid_ppo.txt, args/*.txt ×30).

Everything here is derived from the programmatic model/hyperparameter tables
in the package — run after changing them:

    python tools/gen_assets.py
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
ASSETS = os.path.join(REPO, "assets")

SKILLS = [
    "backflip", "cartwheel", "crawl", "dance_a", "dance_b",
    "getup_facedown", "getup_faceup", "jump", "kick", "punch",
    "roll", "run", "spin", "spinkick", "walk",
]


def main() -> None:
    from deepmimic_mujoco_tpu.dp_policy.ppo_agent import DEFAULT_SPEC
    from deepmimic_mujoco_tpu.physics.deepmimic_character import (
        export_character)

    character, controller = export_character()
    os.makedirs(os.path.join(ASSETS, "characters"), exist_ok=True)
    os.makedirs(os.path.join(ASSETS, "controllers"), exist_ok=True)
    os.makedirs(os.path.join(ASSETS, "agents"), exist_ok=True)
    os.makedirs(os.path.join(ASSETS, "args"), exist_ok=True)

    with open(os.path.join(ASSETS, "characters", "humanoid3d.json"), "w") as f:
        json.dump(character, f, indent=2)
    with open(os.path.join(ASSETS, "controllers",
                           "humanoid3d_ctrl.json"), "w") as f:
        json.dump(controller, f, indent=2)
    with open(os.path.join(ASSETS, "agents",
                           "ct_agent_humanoid_ppo.json"), "w") as f:
        json.dump(DEFAULT_SPEC, f, indent=2)

    # arg files: the original DeepMimic '--key value…' scene configs
    # (reference format: src/args/{train,run}_humanoid3d_<skill>_args.txt).
    # fall_contact_bodies is per-skill (reference src/args/): floor-borne
    # skills never terminate on contact (getup_*/roll have NO flag), crawl
    # allows everything but root/chest/neck; upright skills use the full
    # list.
    fall_lines = {
        "getup_facedown": "", "getup_faceup": "", "roll": "",
        "crawl": "--fall_contact_bodies 0 1 2\n",
    }
    default_fall = ("--fall_contact_bodies 0 1 2 3 4 6 7 8 9 10 12 13 14\n")
    for skill in SKILLS:
        fall = fall_lines.get(skill, default_fall)
        train = f"""\
--scene imitate

--num_update_substeps 10
--num_sim_substeps 2
--world_scale 4

--terrain_file assets/terrain/plane.json
--char_types general
--character_files assets/characters/humanoid3d.json
--enable_char_soft_contact false
{fall}
--char_ctrls ct_pd
--char_ctrl_files assets/controllers/humanoid3d_ctrl.json
--motion_file assets/motions/humanoid3d_{skill}.npz
--sync_char_root_pos true
--sync_char_root_rot false

--agent_files assets/agents/ct_agent_humanoid_ppo.json
--train_agents true

--output_path output
--int_output_path output/intermediate
"""
        run = f"""\
--scene imitate

--num_update_substeps 10
--num_sim_substeps 2
--world_scale 4

--terrain_file assets/terrain/plane.json
--char_types general
--character_files assets/characters/humanoid3d.json
--enable_char_soft_contact false

--char_ctrls ct_pd
--char_ctrl_files assets/controllers/humanoid3d_ctrl.json
--motion_file assets/motions/humanoid3d_{skill}.npz
--sync_char_root_pos true
--sync_char_root_rot false

--agent_files assets/agents/ct_agent_humanoid_ppo.json
--train_agents false

--model_files none
"""
        with open(os.path.join(
                ASSETS, "args", f"train_humanoid3d_{skill}_args.txt"),
                "w") as f:
            f.write(train)
        with open(os.path.join(
                ASSETS, "args", f"run_humanoid3d_{skill}_args.txt"),
                "w") as f:
            f.write(run)

    # terrain spec (reference: src/data/terrain/plane.txt)
    os.makedirs(os.path.join(ASSETS, "terrain"), exist_ok=True)
    with open(os.path.join(ASSETS, "terrain", "plane.json"), "w") as f:
        json.dump({"Type": "plane"}, f)

    n = sum(len(fs) for _, _, fs in os.walk(ASSETS))
    print(f"assets generated under {ASSETS} ({n} files)")


if __name__ == "__main__":
    main()
