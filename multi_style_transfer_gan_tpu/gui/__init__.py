"""Desktop GUI application (gan_login_gui.py capability parity)."""
