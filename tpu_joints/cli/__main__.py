from tpu_joints.cli.main import main

main()
