"""Print the supported configuration keywords (cli/list_config_keys.py)."""
from ..config import list_config_keys


def main():
    print(list(list_config_keys()))


if __name__ == '__main__':
    main()
