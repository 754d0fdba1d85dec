from ntedit_tpu.cli import main

main()
